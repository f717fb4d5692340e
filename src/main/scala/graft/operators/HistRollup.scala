package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, exactly-mergeable quantile rollups — the quantile
  * analog of [[HllRollup]]'s COUNT(DISTINCT) ladder. Exact quantiles,
  * like exact distinct counts, have no partial aggregate: folding
  * hour→day would re-read raw history, which the rollup ladder exists to
  * avoid at 100 TB. Randomized mergeable sketches (KLL, t-digest) solve
  * this but their merges are compaction-order/randomness-dependent, so
  * fold≡direct cannot be pinned exactly and a cross-engine oracle is
  * impossible. A fixed-bin histogram is the deterministic alternative:
  * bin counts are plain sums, so folds are EXACT (byte-identical to a
  * direct build at the coarse level), merges are associative and
  * commutative, and a DuckDB oracle can recompute both the bins and the
  * interpolated quantile estimates bit-for-bit.
  *
  * Representation is deliberately LONG-FORM — one (keys, t, bin, cnt)
  * row per non-empty bin — not an array column folded by a UDAF:
  * built-in `sum` gets whole-stage codegen and map-side partial
  * aggregation (hot buckets combine before the shuffle), while an
  * array-merging UDAF deserializes per row and blocks codegen. A bucket
  * carries at most `nbins` rows regardless of raw cardinality, so the
  * rollup traffic stays metadata-scale either way.
  *
  * Accuracy: an estimated p-quantile lands inside the bin holding rank
  * p·n, i.e. within one bin width of the exact quantile (pinned in
  * OperatorsSpec). Pick `nbins` for the error budget; 64–512 bins cover
  * typical telemetry ranges at negligible rollup cost.
  */
object HistRollup {

  /** Fixed binning: [lo, hi) split into `nbins` equal bins; values
    * outside clamp into the edge bins (so the estimate degrades at the
    * edges rather than dropping rows).
    */
  final case class HistSpec(lo: Double, hi: Double, nbins: Int) {
    require(nbins > 0 && hi > lo, s"bad HistSpec($lo, $hi, $nbins)")
    val width: Double = (hi - lo) / nbins
    /** Clamped bin index, identical arithmetic on Spark and DuckDB. */
    def bin(v: Column): Column =
      least(greatest(floor((v - lit(lo)) / lit(width)), lit(0)),
        lit(nbins - 1)).cast("long")
  }

  private def bucketSec(secCol: Column, granSeconds: Long): Column =
    (secCol.cast("long") / granSeconds).cast("long") * granSeconds

  /** Finest materialized level: one (keys, t, bin, cnt) row per non-empty
    * bin per time bucket. `t` is the bucket start in epoch seconds
    * (BIGINT — timestamps round-trip engines losslessly that way). One
    * shuffle on (keys, bucket, bin) with map-side combine.
    */
  def histBuckets(df: DataFrame, valueCol: String, secCol: String,
      granSeconds: Long, keyCols: Seq[String], spec: HistSpec): DataFrame =
    df.groupBy(keyCols.map(col)
        :+ bucketSec(col(secCol), granSeconds).as("t")
        :+ spec.bin(col(valueCol)).as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Fold an already-binned level into coarser buckets — a plain sum, so
    * the result is EXACTLY the histogram a direct build at the coarse
    * granularity would produce (pinned fold≡direct in OperatorsSpec).
    * Never re-reads raw values.
    */
  def fold(hist: DataFrame, coarserGranSeconds: Long,
      keyCols: Seq[String]): DataFrame =
    hist.groupBy(keyCols.map(col)
        :+ bucketSec(col("t"), coarserGranSeconds).as("t")
        :+ col("bin"): _*)
      .agg(sum("cnt").as("cnt"))

  /** Read-time quantile estimates: for each (keys, t) group and each
    * requested (name, p), locate the bin where the cumulative count
    * crosses rank p·n and linearly interpolate inside it:
    *
    *   est = lo + width · (bin + (p·n − cum_before) / cnt)
    *
    * Pure integer cumulative sums + one double expression, written so a
    * SQL oracle reproduces it operation-for-operation. The window is
    * partitioned by (keys, t) over ≤ nbins rows — bounded memory per
    * group, parallel across groups.
    */
  def quantiles(hist: DataFrame, keyCols: Seq[String],
      ps: Seq[(String, Double)], spec: HistSpec): DataFrame = {
    val grp = keyCols :+ "t"
    val w = Window.partitionBy(grp.map(col): _*).orderBy("bin")
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(
        Window.partitionBy(grp.map(col): _*)))
    val ests = ps.map { case (name, p) =>
      val rank = lit(p) * col("n")
      max(when((col("cum") - col("cnt")) < rank && rank <= col("cum"),
        lit(spec.lo) + lit(spec.width) *
          (col("bin") + (rank - (col("cum") - col("cnt"))) / col("cnt"))))
        .as(name)
    }
    cum.groupBy((grp :+ "n").map(col): _*)
      .agg(ests.head, ests.tail: _*)
  }
}
