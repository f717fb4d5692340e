package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles in the DISTRIBUTED rank
  * lane — the scale-safe replacement for `percentile(col, array(...))`:
  * that built-in is an ObjectHashAggregate whose buffer holds every
  * distinct (value → count) of the group and merges them into ONE
  * reducer per group, so a 3-group query at 100 TB ends as 3 final-merge
  * tasks holding GB-scale maps. Here nothing ever buffers a group:
  *
  *  1. distinct-value counts — `groupBy(group, value).count` (partial
  *     map-side aggregation, the only corpus-wide shuffle);
  *  2. a running-count CDF over the DISTINCT table only (per-group sort
  *     window, O(1) memory per row — the [[graft.SparkEntry]]
  *     pipe_quantile_norm discipline; per-group DISTINCT cardinality is
  *     the sort span, never the row count);
  *  3. target ranks per (group, p) from broadcast group totals —
  *     `pos = p·(n−1)` (0-based), bracketing 1-based ranks
  *     `floor(pos)+1` / `ceil(pos)+1`;
  *  4. ONE broadcast range join locates both bracketing values (rank r
  *     lives in the distinct value whose `[cum−cnt+1, cum]` interval
  *     contains it) and the interpolation reproduces Spark
  *     `percentile`'s exact arithmetic — `(ceil(pos)−pos)·v_lo +
  *     (pos−floor(pos))·v_hi`, `v_lo` when pos is integral — so results
  *     are bit-identical to the built-in (and to DuckDB quantile_cont,
  *     as the oracle gate already established for the built-in).
  *
  * Output: one row per group with one DOUBLE column per requested
  * percentile, named by `names` (parallel to `ps`).
  */
object Percentiles {

  def exactInterpolated(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(Double, String)], checkpoint: Boolean = true): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val g = col(groupCol)
    val vc = df.groupBy(groupCol, valCol).agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(groupCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf0 = vc.withColumn("cum", sum("cnt").over(wcum))
    // feeds the totals AND the range join — never recompute the window
    val cdf = if (checkpoint) cdf0.localCheckpoint(true) else cdf0
    val totals = cdf.groupBy(groupCol).agg(max("cum").as("n"))
    // 2 target rows per (group, percentile): the lo and hi bracketing
    // ranks, exploded so ONE pass over the CDF serves both
    val targets = totals.select(g.as("tg"), col("n"),
        explode(array(ps.map { case (p, _) => lit(p) }: _*)).as("p"))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .select(col("tg"), col("p"), col("pos"),
        explode(array(
          struct(lit("lo").as("role"), (floor(col("pos")) + 1).as("r")),
          struct(lit("hi").as("role"), (ceil(col("pos")) + 1).as("r"))))
          .as("rr"))
      .select(col("tg"), col("p"), col("pos"),
        col("rr.role").as("role"), col("rr.r").as("r"))
    val bracket = cdf.join(broadcast(targets),
        g === col("tg") &&
          col("r") >= col("cum") - col("cnt") + 1 && col("r") <= col("cum"))
      .groupBy("tg", "p", "pos")
      .agg(max(when(col("role") === "lo", col(valCol))).as("v_lo"),
        max(when(col("role") === "hi", col(valCol))).as("v_hi"))
      .withColumn("v",
        when(col("pos") === floor(col("pos")).cast("double"), col("v_lo"))
          .otherwise(
            (ceil(col("pos")).cast("double") - col("pos")) * col("v_lo") +
              (col("pos") - floor(col("pos")).cast("double")) * col("v_hi")))
    bracket.groupBy(col("tg").as(groupCol))
      .agg(ps.map { case (p, name) =>
        max(when(col("p") === p, col("v"))).as(name)
      }.head, ps.tail.map { case (p, name) =>
        max(when(col("p") === p, col("v"))).as(name)
      }: _*)
  }

  /** Convenience overload: percentile list with auto names p<pct>. */
  def exactInterpolated(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double]): DataFrame =
    exactInterpolated(df, groupCol, valCol,
      ps.map(p => p -> s"p${(p * 100).round}"))
}
