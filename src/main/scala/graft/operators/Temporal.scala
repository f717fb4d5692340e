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

  /** Per-key lag-k autocorrelation (ACF) — the standard "does this
    * telemetry stream have short-range memory / periodicity" diagnostic a
    * time-series user runs before choosing a model or a downsample rate.
    *
    * Exactness: values quantize to BIGINT fixed-point `floor(v·1000)`
    * (milli-units) and every sufficient statistic (pair count, Σq·q₊ₖ,
    * Σq, Σq₊ₖ, Σq², Σq₊ₖ²) is an INTEGER sum — associative under any
    * partitioning and reproducible by any engine (CLAUDE.md cross-engine
    * rule). The Pearson ACF then derives from those exact integers in one
    * fixed-shape double expression, so even the float is bit-identical
    * cross-engine. Overflow headroom (ANSI-safe): |q| ≤ 5·10⁵ here, so a
    * product is ≤ 2.4·10¹¹ and ~3.8·10⁷ rows per stream fit a signed
    * 64-bit sum; the final n·Σ products are computed in DOUBLE so stream
    * length never overflows the derivation.
    *
    * Scale shape: ONE window pass per key (all lead(q, k) share one
    * window spec → one sort) + one keyed hash agg with map-side partials;
    * the tiny aggregated row then unpivots via `stack` into one row per
    * lag. Nothing shuffles more than (key, 6·|lags| longs).
    */
  def autocorr(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), "lags must be positive")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val q = df.withColumn("__q",
      floor(col(valueCol) * 1000.0).cast("long"))
    val withLeads = lags.foldLeft(q)((d, k) =>
      d.withColumn(s"__l$k", lead(col("__q"), k).over(w)))
    val aggs = lags.flatMap { k =>
      val l = col(s"__l$k")
      Seq(
        sum(when(l.isNotNull, 1L)).as(s"n$k"),
        sum(col("__q") * l).as(s"c$k"),
        sum(when(l.isNotNull, col("__q"))).as(s"sa$k"),
        sum(l).as(s"sb$k"),
        sum(when(l.isNotNull, col("__q") * col("__q"))).as(s"sqa$k"),
        sum(l * l).as(s"sqb$k"))
    }
    val stackArgs = lags
      .map(k => s"$k, n$k, c$k, sa$k, sb$k, sqa$k, sqb$k")
      .mkString(", ")
    val num = col("n_pairs").cast("double") * col("c_fp").cast("double") -
      col("sa_fp").cast("double") * col("sb_fp").cast("double")
    val da = col("n_pairs").cast("double") * col("sqa_fp").cast("double") -
      col("sa_fp").cast("double") * col("sa_fp").cast("double")
    val db = col("n_pairs").cast("double") * col("sqb_fp").cast("double") -
      col("sb_fp").cast("double") * col("sb_fp").cast("double")
    withLeads
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol), expr(s"stack(${lags.size}, $stackArgs) as " +
        "(lag, n_pairs, c_fp, sa_fp, sb_fp, sqa_fp, sqb_fp)"))
      .where(col("n_pairs").isNotNull && col("n_pairs") > 0)
      .withColumn("acf",
        when(da > 0.0 && db > 0.0, round(num / sqrt(da * db), 6)))
  }

  /** Per-point one-sided CUSUM pair (Page's test) — the classic online
    * drift detector, via its prefix closed form: the recurrence
    * `S⁺_i = max(0, S⁺_{i-1} + d_i)` equals `P_i − min(0, min_{j≤i} P_j)`
    * where `P` is the prefix sum of deviations `d = q − target`, so the
    * whole statistic is two growing-frame window passes — O(n) per key,
    * batch-expressible, and EXACT (all integers; the same closed form the
    * streaming twin [[graft.streaming.Streaming.cusum]] maintains with
    * O(1) state, pinned equal in StreamingSpec).
    *
    * `targetFp`: the reference level in fixed-point milli-units; None
    * derives it per key as `floor-div(Σq, n)` (integer division — exact
    * and engine-identical, unlike a float mean).
    *
    * Output per row: (key, order, q_fp, target_fp, s_plus_fp,
    * s_minus_fp, alarm) — alarm once either side exceeds `thresholdFp`.
    */
  /** Goertzel periodicity power at a FIXED coefficient — the
    * single-frequency DFT probe ("how strong is the daily cycle")
    * without materializing a spectrum: per key, fold the ordered
    * series through `s = x + coef·s1 − s2` (coef = 2·cos(2π/period),
    * passed as a DECIMAL LITERAL so both engines parse the identical
    * double — never computed from π) and report
    * `s1² + s2² − coef·s1·s2`. Callers feed a series whose values are
    * already cross-engine-exact (fixed-point sums divided by a power
    * of ten); the fold is then bit-identical and the oracle replays it
    * as a recursive CTE (two scalar state fields — the drv_holt
    * shape). One shuffle on the key; sequential per key like every
    * recurrence (the streaming form would keep (s1, s2) as O(1)
    * state). Output: (key, n_points, power).
    */
  def goertzelPower(df: DataFrame, keyCol: String, orderCol: String,
      xCol: String, coef: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(orderCol).cast("long"),
        col(xCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val sorted = rows.toSeq.sortBy(_._2)
        var s1 = 0.0
        var s2 = 0.0
        sorted.foreach { case (_, _, x) =>
          val s = x + coef * s1 - s2
          s2 = s1
          s1 = s
        }
        (k, sorted.size.toLong, s1 * s1 + s2 * s2 - coef * s1 * s2)
      }
      .toDF(keyCol, "n_points", "power")
  }

  def cusumPoints(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, targetFp: Option[Long],
      thresholdFp: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val q = df.withColumn("q_fp", floor(col(valueCol) * 1000.0).cast("long"))
    val withTarget = targetFp match {
      case Some(t) => q.withColumn("target_fp", lit(t))
      case None => q
        .withColumn("__s_all", sum("q_fp").over(wAll))
        .withColumn("__n_all", count(lit(1)).over(wAll))
        // integer floor division (Spark `div` ≡ DuckDB `//`) — a float
        // mean would put a rounding lane in every downstream integer
        .withColumn("target_fp", expr("__s_all div __n_all"))
    }
    withTarget
      .withColumn("__p", sum(col("q_fp") - col("target_fp")).over(wRun))
      .withColumn("s_plus_fp",
        col("__p") - least(lit(0L), min("__p").over(wRun)))
      .withColumn("s_minus_fp",
        greatest(lit(0L), max("__p").over(wRun)) - col("__p"))
      .withColumn("alarm", col("s_plus_fp") > thresholdFp ||
        col("s_minus_fp") > thresholdFp)
      .select(col(keyCol), col(orderCol), col("q_fp"), col("target_fp"),
        col("s_plus_fp"), col("s_minus_fp"), col("alarm"))
  }

  /** Single changepoint detection per key: the split position maximizing
    * the two-sample mean-shift statistic |μ_L − μ_R|·√(p·(n−p)/n) — the
    * CUSUM-equivalent scan statistic, evaluated at EVERY split in O(n)
    * per key via prefix sums (a recurrence-style CUSUM is not
    * window-expressible; the split-scan form is, and detects the same
    * single level shift).
    *
    * Exactness: prefix sums are BIGINT fixed-point (`floor(v·1000)`), so
    * the cross-multiplied mean difference `diff = S_p·(n−p) − (S_n−S_p)·p`
    * is exact (headroom: |S_n|·n ≤ 9.2·10¹⁸ ⇒ ~4·10⁶ rows per stream at
    * |v| ≤ 500). The score is one fixed-shape double expression over those
    * integers; ranking follows the CLAUDE.md float-rank rule — on
    * `round(score, 6)` with the split position as tiebreak.
    *
    * Scale shape: two same-partition window passes (ordered prefix sums +
    * partition-constant totals share one sort; the rank is a second sort
    * over the same key partitioning) — no self-join, no driver state.
    */
  def changepoint(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val wAll = Window.partitionBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = df
      .withColumn("__q", floor(col(valueCol) * 1000.0).cast("long"))
      .withColumn("p", row_number().over(w).cast("long"))
      .withColumn("s_p", sum("__q").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s_n", sum("__q").over(wAll))
      .where(col("p") < col("n"))
      .withColumn("diff_fp", col("s_p") * (col("n") - col("p")) -
        (col("s_n") - col("s_p")) * col("p"))
      .withColumn("score", round(
        abs(col("diff_fp")).cast("double") /
          sqrt(col("p").cast("double") * (col("n") - col("p")).cast("double")
            * col("n").cast("double")) / 1000.0, 6))
    scored
      .withColumn("__rk", row_number().over(Window.partitionBy(keyCol)
        .orderBy(col("score").desc, col("p"))))
      .where(col("__rk") === 1)
      .select(col(keyCol), col("n"), col("p").as("split_pos"),
        col(orderCol).as("split_at"), col("diff_fp"), col("score"),
        round(col("s_p").cast("double") /
          (col("p").cast("double") * 1000.0), 6).as("mean_left"),
        round((col("s_n") - col("s_p")).cast("double") /
          ((col("n") - col("p")).cast("double") * 1000.0), 6)
          .as("mean_right"))
  }
}
