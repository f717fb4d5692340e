package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY "spill-aware" scale notes).
  *
  * Algebraic aggregates (sum/count/min/max) already survive skew via
  * Spark's partial (map-side) aggregation, and AQE splits skewed join
  * partitions at runtime. The remaining hard case is per-key DISTINCT
  * aggregation over a hot key: every distinct value of the hot key lands
  * in one reducer. `saltedDistinctCount` spreads that key over
  * `saltBuckets` reducers with a two-stage exact merge.
  */
object Skew {

  /** Exact count(DISTINCT valueCol) per key, skew-spread over salt
    * buckets. Stage 1 dedups (key, salt-of-value, value) — the hot key's
    * values split across `saltBuckets` reducers; stage 2 sums per-salt
    * distinct counts (no overlap between salt buckets, so the sum is
    * exact).
    */
  def saltedDistinctCount(df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.select(col(keyCol), col(valueCol),
      pmod(xxhash64(col(valueCol)), lit(saltBuckets)).as("__salt"))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n_distinct"))
  }

  /** Salted key column for manual skew-spreading of a hot aggregation
    * key: append a deterministic per-row salt, aggregate on (key, salt)
    * with partial-mergeable aggregates, then merge on key.
    */
  def saltKey(key: Column, buckets: Int, entropy: Column): Column =
    concat_ws("#", key, pmod(xxhash64(entropy), lit(buckets)))
}
