package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (SURVEY §2.4 preference ladder (b)).
  *
  * The declarative formulation materialized the full n × m × ksub
  * distance relation (vec × broadcast codebook cross join), ranked it
  * with a window per (vec, subspace) and re-joined it per candidate pair
  * — 10M+ rows, a sort, and a three-way join at sf0.1 (measured 59 CPU
  * s). These two fused kernels keep the SAME doubles bit-for-bit (the
  * oracle SQL is untouched): subspace distance is the exact
  * `(self − 2·dot) + |c|²` parenthesization, argmin scans entries
  * ascending with strict `<` (ties → lowest entry id, = the window's
  * (d2, cent_id) order), and ADC accumulates subspaces 0..m−1
  * left-associatively (= the fixed conditional-aggregate chain).
  *
  * The codebook + its entry self-dots arrive as LITERAL children
  * (metadata-scale: m × ksub × sub doubles) and are decoded ONCE per
  * executor instance via lazy vals — never per row.
  */
private[functions] trait PqCodebook { self: Expression =>
  /** codebook literal: array<array<array<double>>> (s → j → subvector) */
  def cbE: Expression
  /** entry self-dots literal: array<array<double>> (s → j → |c|²) */
  def cn2E: Expression

  protected lazy val cb: Array[Array[Array[Double]]] = {
    val outer = cbE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { s =>
      val mid = outer.getArray(s)
      Array.tabulate(mid.numElements())(j => mid.getArray(j).toDoubleArray())
    }
  }
  protected lazy val cn2: Array[Array[Double]] = {
    val outer = cn2E.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements())(s => outer.getArray(s).toDoubleArray())
  }

  protected final def subDot(q: Array[Double], c: Array[Double]): Double = {
    val n = math.min(q.length, c.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += q(i) * c(i); i += 1 }
    dot
  }
}

/** graft_pq_encode(subs, selfd, cb, cn2) → array<int> PQ codes: per
  * subspace, the argmin-L2² codebook entry (ties → lowest id).
  */
case class PqEncode(subs: Expression, selfd: Expression,
    cbE: Expression, cn2E: Expression)
    extends Expression with CodegenFallback with PqCodebook {
  override def children: Seq[Expression] = Seq(subs, selfd, cbE, cn2E)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def eval(input: InternalRow): Any = {
    val sb = subs.eval(input).asInstanceOf[ArrayData]
    val sd = selfd.eval(input).asInstanceOf[ArrayData]
    if (sb == null || sd == null) return null
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val qs = sb.getArray(s).toDoubleArray()
      val self = sd.getDouble(s)
      val books = cb(s)
      val c2 = cn2(s)
      var best = 0
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < books.length) {
        val d2 = (self - 2.0 * subDot(qs, books(j))) + c2(j)
        if (d2 < bd) { bd = d2; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PqEncode =
    copy(subs = c(0), selfd = c(1), cbE = c(2), cn2E = c(3))
}

/** graft_pq_adc(qsubs, qselfd, codes, cb, cn2) → double: asymmetric
  * distance — the query's exact subspace L2² to each coded entry, summed
  * over subspaces 0..m−1 left-associatively.
  */
case class PqAdc(qsubs: Expression, qselfd: Expression, codes: Expression,
    cbE: Expression, cn2E: Expression)
    extends Expression with CodegenFallback with PqCodebook {
  override def children: Seq[Expression] = Seq(qsubs, qselfd, codes, cbE, cn2E)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def eval(input: InternalRow): Any = {
    val sb = qsubs.eval(input).asInstanceOf[ArrayData]
    val sd = qselfd.eval(input).asInstanceOf[ArrayData]
    val cd = codes.eval(input).asInstanceOf[ArrayData]
    if (sb == null || sd == null || cd == null) return null
    val m = cb.length
    var acc = 0.0
    var s = 0
    while (s < m) {
      val j = cd.getInt(s)
      acc += (sd.getDouble(s) - 2.0 * subDot(sb.getArray(s).toDoubleArray(),
        cb(s)(j))) + cn2(s)(j)
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PqAdc =
    copy(qsubs = c(0), qselfd = c(1), codes = c(2), cbE = c(3), cn2E = c(4))
}
