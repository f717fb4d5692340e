package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_gram_agg(embedding, y, dims)` → the EXACT fixed-point normal-
  * equation statistics of a linear probe, as one array<bigint>:
  *
  *   layout [0, T)          upper-triangle Gram matrix G = Σ q qᵀ
  *          [T, T+dims)     moment vector b = Σ q·y
  *          [T+dims]        row count n          (T = dims(dims+1)/2)
  *
  * where q_i = floor(x_i · 2^16) — integer quantization so the sums are
  * exact BIGINT arithmetic, associative under any partition order (and
  * reproducible by any engine, which is what lets the oracle gate pin a
  * "model training" step: the sufficient statistics are checked exactly;
  * only the dims×dims solve happens driver-side).
  *
  * Scale shape: ONE pass, map-side combinable — each partition folds its
  * rows into a dims(dims+3)/2+1-long buffer (dims=64 → 2,145 longs =
  * 17 KB), and the shuffle moves one buffer per partition, never rows.
  * Overflow headroom: |q| ≤ 2^16·max|x|, so a product is ≲ 2^34 and 2^29
  * rows fit 2^63 — raise the fixed-point scale down if embeddings exceed
  * unit-ish range.
  */
case class GramAgg(emb: Expression, y: Expression, dims: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private val tri = dims * (dims + 1) / 2
  private val len = tri + dims + 1
  private val isFloat = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def left: Expression = emb
  override def right: Expression = y
  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, y.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_agg expects (array<float|double>, int|bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val e = emb.eval(input)
    val yv = y.eval(input)
    if (e != null && yv != null) {
      val arr = e.asInstanceOf[ArrayData]
      val n = math.min(dims, arr.numElements())
      val q = new Array[Long](dims)
      var i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = math.floor(v * 65536.0).toLong
        i += 1
      }
      val yl = yv.asInstanceOf[Number].longValue()
      var idx = 0
      i = 0
      while (i < dims) {
        val qi = q(i)
        var j = i
        while (j < dims) { buf(idx) += qi * q(j); idx += 1; j += 1 }
        buf(tri + i) += qi * yl
        i += 1
      }
      buf(tri + dims) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](len)
    java.nio.ByteBuffer.wrap(b).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GramAgg = copy(emb = l, y = r)
}

/** `graft_gram_multi(embedding, cls, dims, nClasses)` — the multi-class
  * generalization of [[GramAgg]]: ONE data pass yields the shared Gram
  * matrix plus a one-vs-rest moment vector and count PER CLASS, i.e.
  * everything needed to train `nClasses` ridge heads (they share the
  * G factorization; only the right-hand sides differ). Layout:
  *
  *   [0, T)                 upper-triangle G           (T = dims(dims+1)/2)
  *   [T + c·dims, +dims)    b_c = Σ_{y=c} q   for class c
  *   [T + C·dims + c]       n_c per-class row count
  *
  * Same fixed-point exactness and map-side-combine shape as [[GramAgg]].
  */
case class MultiGramAgg(emb: Expression, cls: Expression, dims: Int,
    nClasses: Int, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private val tri = dims * (dims + 1) / 2
  private val len = tri + nClasses * dims + nClasses
  private val isFloat = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def left: Expression = emb
  override def right: Expression = cls
  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, cls.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_multi expects (array<float|double>, int|bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_multi"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val e = emb.eval(input)
    val cv = cls.eval(input)
    if (e != null && cv != null) {
      val c = cv.asInstanceOf[Number].intValue()
      if (c >= 0 && c < nClasses) {
        val arr = e.asInstanceOf[ArrayData]
        val n = math.min(dims, arr.numElements())
        val q = new Array[Long](dims)
        var i = 0
        while (i < n) {
          val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          q(i) = math.floor(v * 65536.0).toLong
          i += 1
        }
        var idx = 0
        i = 0
        while (i < dims) {
          val qi = q(i)
          var j = i
          while (j < dims) { buf(idx) += qi * q(j); idx += 1; j += 1 }
          buf(tri + c * dims + i) += qi
          i += 1
        }
        buf(tri + nClasses * dims + c) += 1L
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](len)
    java.nio.ByteBuffer.wrap(b).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MultiGramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MultiGramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MultiGramAgg = copy(emb = l, cls = r)
}
