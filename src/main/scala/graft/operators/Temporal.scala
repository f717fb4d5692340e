package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-interval (gaps-and-islands / SCD type-2) construction: collapse
  * a keyed event stream's consecutive equal values into validity
  * intervals. The complement of sessionization — sessions break on time
  * GAPS, islands break on value CHANGES; together they cover the two
  * standard "rows → intervals" reshapes a telemetry/warehouse user needs.
  *
  * Scale shape: one window pass per key to flag changes + running-sum
  * island ids, a keyed groupBy per island, and one more per-key window
  * for the exclusive `valid_to` handoff. Everything is partitioned by the
  * entity key — no global sort, no driver state; skewed keys are bounded
  * by that entity's own history like every per-key window in the engine.
  */
object Temporal {

  /** SCD2 intervals of `valueCol` per `keyCol`, ordered by `orderCols`
    * (must totally order each key's rows or lag() is nondeterministic —
    * same rule the derive ops pin).
    *
    * Output: (key…, island, value, valid_from, valid_to, n_events) where
    * `island` is the 0-based change index (stable tie-break even when two
    * islands share a start second), `valid_from` is the island's first
    * `secCol`, `valid_to` is the NEXT island's start (exclusive handoff,
    * NULL for the current interval) and `n_events` counts collapsed rows.
    * Null-safe: a null value is its own island value (`<=>` comparison).
    */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      secCol: String, valueCol: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(orderCols.map(col): _*)
    val islands = df
      .withColumn("_chg",
        when(!(lag(col(valueCol), 1).over(w) <=> col(valueCol)), 1L)
          .otherwise(0L))
      .withColumn("island", sum("_chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
      .groupBy(keys :+ col("island"): _*)
      .agg(min(col(valueCol)).as(valueCol), // constant within an island
        min(col(secCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    islands.withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(keys: _*).orderBy("island")))
      .select(keys ++ Seq(col("island"), col(valueCol), col("valid_from"),
        col("valid_to"), col("n_events")): _*)
  }

  /** Ordered-sequence funnel (the MATCH_RECOGNIZE staple Spark lacks):
    * per key, the earliest time each step of `steps` can complete given
    * the previous step's completion time — t1 = min time of step 1,
    * t_i = min time of step i STRICTLY AFTER t_{i-1}. Greedy-earliest is
    * the standard funnel semantics and is provably optimal (taking the
    * earliest feasible t_{i-1} never excludes a later step).
    *
    * Scale shape: one filtered keyed aggregation + one keyed join per
    * step — everything shuffles on the entity key, no window over the
    * whole event stream, no per-key iteration. Output: (key, t1..tn,
    * steps_completed) with nulls from the first missed step on.
    */
  def funnel(events: DataFrame, steps: Seq[String], keyCol: String,
      typeCol: String, secCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(secCol)).as("t1"))
    for (i <- 2 to steps.length) {
      val next = events.where(col(typeCol) === steps(i - 1))
        .select(col(keyCol), col(secCol).as("__s"))
      // left join keeps every key; rows at-or-before t_{i-1} (and keys
      // whose t_{i-1} is null) contribute null to the min, so a missed
      // step yields t_i = null instead of dropping the key
      acc = acc.join(next, Seq(keyCol), "left")
        .groupBy((keyCol +: (1 until i).map(j => s"t$j")).map(col): _*)
        .agg(min(when(col("__s") > col(s"t${i - 1}"), col("__s")))
          .as(s"t$i"))
    }
    val completed = (1 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .reduceLeft(_ + _)
    acc.withColumn("steps_completed", completed)
  }
}
