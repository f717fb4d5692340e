package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval analytics: the overlap join Spark lacks as a primitive.
  *
  * A naive interval-overlap join (`a.t0 <= b.t1 AND b.t0 <= a.t1`) has no
  * equi-key, so Catalyst plans a broadcast-nested-loop / cartesian — O(n²)
  * comparisons, hopeless at 100 TB. The standard scale trick
  * (bucketed range join, as in interval trees flattened onto a grid):
  * explode every interval onto the fixed-width buckets it touches,
  * equi-join on the bucket id (hash shuffle, fully parallel), then filter
  * to true overlaps and dedup pairs that share several buckets. Shuffle
  * volume is O(n × span/bucketWidth) rows instead of O(n²) comparisons —
  * pick bucketWidth near the typical interval span so most intervals
  * explode to 1–2 buckets.
  */
object Intervals {

  /** All distinct overlapping pairs of intervals with different keys,
    * counted once (`struct(aKeys) < struct(bKeys)` lexicographically).
    * Input: one row per interval with `keyCols`, inclusive `[t0, t1]`
    * bounds (epoch seconds). Output: `a_`/`b_`-prefixed key and bound
    * columns plus `overlap_secs`.
    *
    * The input is localCheckpointed: it feeds both join sides, and Spark
    * would otherwise re-run its whole lineage per side (see the dedup
    * sketch stages for the same pattern) — callers pass a small
    * aggregated interval table, not raw events.
    */
  def overlapPairs(iv: DataFrame, bucketWidth: Long,
      keyCols: Seq[String] = Seq("user_id", "sess_id"),
      t0: String = "t0", t1: String = "t1"): DataFrame = {
    val cached = iv.localCheckpoint(true)
    val exploded = cached.withColumn("bkt",
      explode(sequence(expr(s"$t0 div $bucketWidth"),
        expr(s"$t1 div $bucketWidth"))))
    def side(p: String): DataFrame = exploded.select(
      keyCols.map(c => col(c).as(s"${p}_$c")) ++
        Seq(col(t0).as(s"${p}_t0"), col(t1).as(s"${p}_t1"), col("bkt")): _*)
    def key(p: String): Column =
      struct(keyCols.map(c => col(s"${p}_$c")): _*)
    side("a").join(side("b"), Seq("bkt"))
      .where(key("a") < key("b") &&
        col("a_t0") <= col("b_t1") && col("b_t0") <= col("a_t1"))
      .drop("bkt")
      .distinct() // a pair sharing k buckets matched k times
      .withColumn("overlap_secs",
        least(col("a_t1"), col("b_t1")) - greatest(col("a_t0"), col("b_t0")))
  }
}
