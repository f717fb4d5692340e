package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches over time buckets — the rollup-ladder
  * treatment for COUNT(DISTINCT …), which (unlike c/s/q/l/u) has no exact
  * partial aggregate: exact distinct counts cannot fold hour→day without
  * re-reading raw ids, which is precisely what the ladder exists to avoid
  * at 100 TB. The standard fix is a mergeable sketch column: store one
  * HLL sketch per (key, bucket), fold coarser levels by sketch UNION
  * (register-wise max — lossless for same-lgK sketches, so folded and
  * direct sketches are byte-identical), and estimate only at read time.
  *
  * Built on Spark's Datasketches builtins (`hll_sketch_agg`,
  * `hll_union_agg`, `hll_sketch_estimate`) — codegen'd aggregates, no
  * UDF. No reference counterpart (the reference has no distinct
  * downsampler); this is the north-star scale path proven by
  * OperatorsSpec's fold≡direct and accuracy pins.
  */
object HllRollup {

  private def bucket(tsCol: Column, granSeconds: Long): Column =
    timestamp_seconds(
      floor(unix_timestamp(tsCol) / granSeconds) * granSeconds)

  /** One HLL sketch of `idCol` per (`keyCols`, time bucket) — the finest
    * materialized level. One shuffle on (keys, bucket); sketches are
    * KB-sized regardless of cardinality.
    */
  def sketchBuckets(df: DataFrame, idCol: String, tsCol: String,
      granSeconds: Long, keyCols: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col) :+ bucket(col(tsCol), granSeconds).as("t"): _*)
      .agg(hll_sketch_agg(col(idCol), lit(lgK)).as("sketch"))

  /** Fold an already-sketched level into coarser buckets by sketch union —
    * never re-reads raw ids; input rows are (keys, t, sketch).
    */
  def foldSketches(sketched: DataFrame, granSeconds: Long,
      keyCols: Seq[String]): DataFrame =
    sketched
      .groupBy(keyCols.map(col) :+ bucket(col("t"), granSeconds).as("t"): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Read-time estimate: replace the sketch column with its distinct
    * count. */
  def estimate(sketched: DataFrame): DataFrame =
    sketched.withColumn("n_distinct", hll_sketch_estimate(col("sketch")))
      .drop("sketch")
}

/** Mergeable HEAVY-HITTERS rollups — the frequent-items companion to
  * [[HllRollup]]: "top items per bucket" has no exact partial aggregate
  * either (a locally light item can be globally heavy), so the ladder
  * stores one Misra-Gries-family sketch per (key, bucket) and folds
  * coarser levels by sketch union. Built on the engine's native
  * `graft_freq_agg` / `graft_freq_union` / `graft_freq_topk`
  * TypedImperativeAggregates ([[graft.functions.FreqItemsAgg]]) — live
  * sketch per group, serialization only at shuffle boundaries.
  *
  * While distinct items stay within `maxMapSize` capacity the estimates
  * are exact and merge-order-independent (that's what the oracle gate
  * pins); past capacity the published no-false-negatives bound takes
  * over (pinned in OperatorsSpec).
  */
object FreqRollup {

  private def bucket(tsCol: Column, granSeconds: Long): Column =
    timestamp_seconds(
      floor(unix_timestamp(tsCol) / granSeconds) * granSeconds)

  /** One frequent-items sketch of `itemCol` per (`keyCols`, bucket). */
  def sketchBuckets(df: DataFrame, itemCol: String, tsCol: String,
      granSeconds: Long, keyCols: Seq[String] = Nil,
      maxMapSize: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.groupBy(keyCols.map(col) :+ bucket(col(tsCol), granSeconds).as("t"): _*)
      .agg(expr(s"graft_freq_agg($itemCol, $maxMapSize)").as("sketch"))
  }

  /** Fold sketched buckets into coarser ones by sketch union. */
  def foldSketches(sketched: DataFrame, granSeconds: Long,
      keyCols: Seq[String] = Nil, maxMapSize: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(sketched.sparkSession)
    sketched
      .groupBy(keyCols.map(col) :+ bucket(col("t"), granSeconds).as("t"): _*)
      .agg(expr(s"graft_freq_union(sketch, $maxMapSize)").as("sketch"))
  }

  /** Read-time top-k: one row per heavy hitter, (est desc, item) within
    * each bucket; lb/ub are the sketch's error bounds (lb = ub = est in
    * exact mode).
    */
  def topK(sketched: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(sketched.sparkSession)
    sketched
      .withColumn("__hit", explode(expr(s"graft_freq_topk(sketch, $k)")))
      .select(col("*"), col("__hit.item").as("item"),
        col("__hit.est").as("est"), col("__hit.lb").as("lb"),
        col("__hit.ub").as("ub"))
      .drop("__hit", "sketch")
  }
}
