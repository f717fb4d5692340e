package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus-wide per-dimension embedding statistics as ONE mergeable typed
  * Aggregator — the shuffle shape that survives 100 TB.
  *
  * The obvious formulation (posexplode → groupBy(dim)) shuffles n × d
  * rows; this aggregator keeps the vector WHOLE in the partial buffer
  * (fixed size: 2 × d longs + 2 × d doubles) so the shuffle is
  * O(#partitions × d) regardless of corpus size, and `merge` is
  * associative — the same partial-fold contract the rollup ladder uses.
  *
  * Sums are BIGINT FIXED-POINT (`floor(v · 1e6)`): integer sums are
  * summation-order-independent, so the result is bit-identical across
  * engines and partitionings, where a float sum drifts in the last ulp
  * per partitioning (CLAUDE.md cross-engine rule). Headroom: with
  * |v| ≤ 1 the squared term is ≤ 1e12 per element, so ~9e6 rows fit a
  * signed 64-bit sum; past that widen the partials to DECIMAL(38).
  * min/max stay raw doubles (exact under any order).
  */
object DimStats {

  /** Fixed-point scale: 1e6 (micro-units). */
  val Scale = 1000000L

  /** Mergeable partial state; arrays sized on first reduce (d unknown
    * until a row is seen). Mutated in place — Spark owns the buffer
    * lifecycle between serializations, same idiom as mllib aggregators.
    */
  case class Buf(var n: Long, sumFp: Array[Long], sumSqFp: Array[Long],
      mn: Array[Double], mx: Array[Double])

  val aggregator: Aggregator[Seq[Double], Buf, Buf] =
    new Aggregator[Seq[Double], Buf, Buf] {
      override def zero: Buf =
        Buf(0L, Array.empty, Array.empty, Array.empty, Array.empty)

      private def sized(b: Buf, d: Int): Buf =
        if (b.sumFp.length == d) b
        else Buf(b.n, new Array[Long](d), new Array[Long](d),
          Array.fill(d)(Double.PositiveInfinity),
          Array.fill(d)(Double.NegativeInfinity))

      override def reduce(b0: Buf, v: Seq[Double]): Buf = {
        val b = sized(b0, v.length)
        var i = 0
        while (i < v.length) {
          val x = v(i)
          val fp = math.floor(x * 1e6).toLong
          b.sumFp(i) += fp
          b.sumSqFp(i) += fp * fp
          if (x < b.mn(i)) b.mn(i) = x
          if (x > b.mx(i)) b.mx(i) = x
          i += 1
        }
        b.n += 1
        b
      }

      override def merge(a0: Buf, c: Buf): Buf = {
        if (c.n == 0L) return a0
        val a = sized(a0, c.sumFp.length)
        var i = 0
        while (i < c.sumFp.length) {
          a.sumFp(i) += c.sumFp(i)
          a.sumSqFp(i) += c.sumSqFp(i)
          if (c.mn(i) < a.mn(i)) a.mn(i) = c.mn(i)
          if (c.mx(i) > a.mx(i)) a.mx(i) = c.mx(i)
          i += 1
        }
        a.n += c.n
        a
      }

      override def finish(b: Buf): Buf = b
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }

  /** Per-dimension stats over `vecCol` (array<float|double>): one global
    * typed aggregation, then the SINGLE result row explodes into d rows.
    * Output: (dim 1-based, n, sum_fp, sumsq_fp, mean, std_dev, vmin,
    * vmax) — mean/std derive from the exact integer sums in double
    * arithmetic (std is the reference's naive `sqrt(q/c − m²)`), so both
    * are bit-reproducible cross-engine.
    */
  def dimStats(emb: DataFrame, vecCol: String): DataFrame = {
    val ss = emb.sparkSession
    import ss.implicits._
    val ds = emb.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
    // a typed select returns Dataset[Buf] — the case-class fields arrive
    // already flattened as top-level columns
    val one = ds.select(aggregator.toColumn)
      .select(col("n"), col("sumFp"), col("sumSqFp"), col("mn"), col("mx"))
    val mean = col("sum_fp").cast("double") / (col("n") * lit(1000000.0))
    one
      .select(col("n"), posexplode(arrays_zip(col("sumFp"), col("sumSqFp"),
        col("mn"), col("mx"))))
      .select((col("pos") + 1).cast("long").as("dim"), col("n"),
        col("col.sumFp").as("sum_fp"), col("col.sumSqFp").as("sumsq_fp"),
        col("col.mn").as("vmin"), col("col.mx").as("vmax"))
      .withColumn("mean", mean)
      .withColumn("std_dev", sqrt(greatest(lit(0.0),
        col("sumsq_fp").cast("double") / (col("n") * lit(1000000000000.0))
          - mean * mean)))
      .select("dim", "n", "sum_fp", "sumsq_fp", "mean", "std_dev",
        "vmin", "vmax")
  }

  /** Out-of-distribution / novelty score per vector: the squared
    * z-normalized L2 to the corpus profile, Σ_d ((x_d − μ_d)/σ_d)² —
    * diagonal-covariance Mahalanobis, the standard embedding-space
    * outlier flag a curation pipeline runs before training.
    *
    * The profile comes from [[dimStats]] (collected: d rows, metadata-
    * scale) and is exact fixed-point-derived, so μ/σ are bit-identical
    * cross-engine; scoring is then a shuffle-free projection over the
    * corpus. σ = 0 dimensions contribute 0 (constant dims carry no
    * novelty signal). Scores round(6): the final sum is the one
    * float-order-sensitive step, inside the gate's fp tolerance.
    */
  def oodScores(emb: DataFrame, vecCol: String,
      idCol: String = "vec_id"): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val st = dimStats(emb, vecCol).orderBy("dim")
      .select("mean", "std_dev").collect()
    val means = st.map(_.getDouble(0)).toSeq
    val stds = st.map(_.getDouble(1)).toSeq
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("__e"))
      .withColumn("__z", zip_with(
        zip_with(col("__e"), typedLit(means), (x, m) => x - m),
        typedLit(stds),
        (d, sd) => when(sd === 0.0, lit(0.0)).otherwise(d / sd)))
      .select(col(idCol),
        round(call_function("graft_dot", col("__z"), col("__z")), 6)
          .as("ood"))
  }
}
