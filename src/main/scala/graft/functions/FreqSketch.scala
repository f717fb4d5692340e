package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

/** Mergeable frequent-items (heavy hitters) sketches — the Misra-Gries /
  * Space-Saving family via Datasketches' `ItemsSketch`, wrapped as native
  * `TypedImperativeAggregate`s (the same execution shape as Spark's own
  * `hll_sketch_agg`): the LIVE sketch object is the aggregation buffer,
  * serialized only at partition boundaries — never per input row, which
  * is what makes a sketch over 10^12 rows one map-side pass.
  *
  * Exactness contract (what the oracle gate leans on): while the number
  * of DISTINCT items ever seen stays within the sketch's nominal map
  * capacity, no eviction can occur in ANY partial sketch, so merged
  * estimates are EXACT counts, deterministic under every merge order.
  * Beyond capacity the sketch degrades to the published guarantee
  * (error <= 3.5 n / maxMapSize, no false negatives under
  * NO_FALSE_NEGATIVES) — pinned in OperatorsSpec, not in the gate.
  */
object FreqSketch {
  private[functions] val serde = new ArrayOfStringsSerDe

  private[functions] def ser(s: ItemsSketch[String]): Array[Byte] =
    s.toByteArray(serde)
  private[functions] def des(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), serde)
}

/** `graft_freq_agg(item, maxMapSize)` → binary frequent-items sketch of a
  * string column. `maxMapSize` must be a power of 2 (Datasketches
  * contract).
  */
case class FreqItemsAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_agg expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b); a
  }
  override def eval(buf: ItemsSketch[String]): Any = FreqSketch.ser(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqSketch.ser(buf)
  override def deserialize(b: Array[Byte]): ItemsSketch[String] = FreqSketch.des(b)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** `graft_freq_union(sketch)` → union of serialized frequent-items
  * sketches (the fold step of a rollup ladder — never re-reads raw items).
  */
case class FreqUnionAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_union expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_union"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(FreqSketch.des(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b); a
  }
  override def eval(buf: ItemsSketch[String]): Any = FreqSketch.ser(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqSketch.ser(buf)
  override def deserialize(b: Array[Byte]): ItemsSketch[String] = FreqSketch.des(b)

  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqUnionAgg =
    copy(child = c)
}

/** `graft_freq_topk(sketch, k)` → the sketch's top-k heavy hitters as
  * array<struct<item, est, lb, ub>> under NO_FALSE_NEGATIVES (every true
  * heavy hitter appears; some light items may). Deterministic order:
  * (est desc, item asc) — Datasketches' own ordering is insertion-
  * history-dependent, which would make rollup outputs depend on merge
  * order even in exact mode.
  *
  * CodegenFallback: one virtual call per ROLLUP row (thousands), each
  * running the sketch extraction — nothing per raw datapoint.
  */
case class FreqTopK(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_topk expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_freq_topk"

  override def nullSafeEval(in: Any): Any = {
    val sk = FreqSketch.des(in.asInstanceOf[Array[Byte]])
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val top = rows.sortBy(r => (-r.getEstimate, r.getItem)).take(k)
    new GenericArrayData(top.map { r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
        r.getLowerBound, r.getUpperBound): Any
    })
  }

  override protected def withNewChildInternal(c: Expression): FreqTopK =
    copy(child = c)
}
