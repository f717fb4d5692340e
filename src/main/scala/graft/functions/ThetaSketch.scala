package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}

/** Theta sketches — mergeable distinct-count summaries with full SET
  * ALGEBRA. HLL answers only |A| and |A∪B|; theta sketches answer
  * |A∩B| and |A\B| too, which is the "audience overlap" question ("how
  * many distinct users did BOTH X and Y?") that exact COUNT(DISTINCT)
  * cannot fold and HLL cannot intersect. Store one sketch per
  * (segment, bucket), combine at read time — any overlap question over
  * any segment pair without re-reading raw ids.
  *
  * Exactness contract (what the gate oracle leans on): a theta sketch
  * retains RAW hashes until it exceeds its nominal entry count (2^lgK),
  * so while every per-bucket distinct count stays under 2^lgK, union /
  * intersection results are EXACT and merge-order-independent. Past
  * that, estimates carry the published relative-error bound — pinned in
  * OperatorsSpec, not the gate.
  *
  * Same execution shape as [[FreqItemsAgg]]: TypedImperativeAggregate,
  * live Union gadget as the buffer, bytes only at shuffle boundaries.
  */
object ThetaSketch {
  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
  private[functions] def des(b: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(b))
  private[functions] def updateAny(u: Union, v: Any): Unit = v match {
    case s: UTF8String => u.update(s.toString)
    case l: java.lang.Long => u.update(l.longValue())
    case i: java.lang.Integer => u.update(i.longValue())
    case s: java.lang.Short => u.update(s.longValue())
    case b: java.lang.Byte => u.update(b.longValue())
    case d: java.lang.Double => u.update(d.doubleValue())
    case f: java.lang.Float => u.update(f.doubleValue())
    case other => u.update(other.toString)
  }
}

/** `graft_theta_agg(id, lgK)` → binary theta sketch of a column's
  * distinct values.
  */
case class ThetaAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_agg expects string or numeric, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_agg"

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) ThetaSketch.updateAny(buf, v)
    buf
  }
  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(b: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK); u.union(ThetaSketch.des(b)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaAgg =
    copy(child = c)
}

/** `graft_theta_union(sketch, lgK)` → union of serialized theta sketches
  * (rollup fold step).
  */
case class ThetaUnionAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_union"

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(ThetaSketch.des(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(b: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK); u.union(ThetaSketch.des(b)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** `graft_theta_and(a, b)` → intersection sketch; `graft_theta_or(a, b)`
  * → pairwise union sketch; `graft_theta_not(a, b)` → set difference
  * a \ b. All binary → binary, composable before a final estimate.
  */
case class ThetaCombine(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_$op expects (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"graft_theta_$op"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketch.des(a.asInstanceOf[Array[Byte]])
    val sb = ThetaSketch.des(b.asInstanceOf[Array[Byte]])
    val res: CompactSketch = op match {
      case "and" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult
      case "or" =>
        val u = SetOperation.builder().buildUnion()
        u.union(sa); u.union(sb); u.getResult
      case "not" =>
        val d = SetOperation.builder().buildANotB()
        d.setA(sa); d.notB(sb); d.getResult(true)
    }
    res.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaCombine = copy(left = l, right = r)
}

/** `graft_theta_est(sketch)` → BIGINT distinct estimate (exact while the
  * sketch never left exact mode).
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_est expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_est"

  override def nullSafeEval(in: Any): Any =
    Math.round(ThetaSketch.des(in.asInstanceOf[Array[Byte]]).getEstimate)

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}
