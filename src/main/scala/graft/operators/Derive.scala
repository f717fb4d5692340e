package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model._

/** The reference's four derive operators (SURVEY.md §2.3) as batch
  * DataFrame pipelines. Input/output shape: (stream_id, t, v).
  *
  * All windows are partitioned by stream_id — per-stream sequential logic
  * distributes across executors by key; nothing is collected to the driver.
  *
  * Semantics choices pinned here (reference dir was empty; these are the
  * documented/most-defensible readings, also used verbatim in the DuckDB
  * oracle so both sides agree):
  *  - V1 `sum`: bucket-aligned pointwise sum; a bucket is emitted when ANY
  *    source has a datapoint in it (nulls ignored by sum).
  *  - V2 `derivative`: (v − lag v)/(t − lag t in seconds); first point of a
  *    stream emits nothing; zero dt is dropped (cannot divide).
  *  - V3 `counter_reset`: emits value 1 at each t where v < lag v.
  *  - V4 `counter_derivative`: wrap-aware delta/dt; with maxValue m,
  *    delta = v ≥ prev ? v−prev : (m − prev) + v; without maxValue a
  *    decrease is skipped. Intervals containing a reset-stream event are
  *    suppressed.
  */
object Derive {

  // tie-break on v: the store legitimately holds duplicate rounded
  // timestamps per stream (two events in one bucket are two datapoints),
  // and an order-by-t-only lag would make results for the point AFTER a
  // duplicate-t run partition-order-dependent — the incremental rewrite
  // (lookback union + tail scan) could then legally diverge from a full
  // recompute on identical data. (t, v) is a deterministic total order
  // for distinct rows, matching ewma's sort.
  private def lagWindow = Window.partitionBy("stream_id").orderBy("t", "v")

  /** V1: pointwise sum of N source streams into one derived stream.
    * Sources are aligned by flooring t to `g` buckets (an N-way
    * coalesce-by-time over a union — NOT a relational join, so it's one
    * shuffle on (bucket) regardless of N).
    */
  def streamSum(sources: DataFrame, g: Granularity, outStreamId: String): DataFrame =
    streamSumKeyed(sources
      .withColumn("stream_id", lit(outStreamId))
      .withColumn("gsec", lit(g.seconds)))

  /** Set-wise V1: input rows are already RE-KEYED to their OUTPUT stream
    * id and tagged with that stream's bucket width `gsec` — N derived sum
    * streams aggregate in ONE shuffle on (stream_id, bucket), never a job
    * per stream (the store's derive cascade feeds every affected sum
    * stream of a wave through one call).
    */
  def streamSumKeyed(tagged: DataFrame): DataFrame = {
    tagged
      .withColumn("bucket_epoch",
        floor(unix_timestamp(col("t")) / col("gsec")) * col("gsec"))
      .groupBy(col("stream_id"), col("bucket_epoch"))
      .agg(sum(col("v")).as("v"))
      .select(
        col("stream_id"),
        timestamp_seconds(col("bucket_epoch")).as("t"),
        col("v"))
  }

  /** V2: dv/dt between consecutive points, per input stream (output keeps
    * the input `stream_id`; callers deriving a new stream rename it).
    */
  def derivative(source: DataFrame): DataFrame = {
    val w = lagWindow
    source
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .where(col("prev_v").isNotNull &&
             unix_timestamp(col("t")) =!= unix_timestamp(col("prev_t")))
      .select(
        col("stream_id"),
        col("t"),
        ((col("v") - col("prev_v")) /
          (unix_timestamp(col("t")) - unix_timestamp(col("prev_t")))).as("v"))
  }

  /** V3: emit 1 wherever a monotonically-increasing counter decreased. */
  def counterReset(source: DataFrame): DataFrame = {
    val w = lagWindow
    source
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .where(col("prev_v").isNotNull && col("v") < col("prev_v"))
      .select(col("stream_id"), col("t"), lit(1.0).as("v"))
  }

  /** V4: rate of a wrapping counter, optionally suppressed across resets.
    * Reset suppression is implemented as union + last-known-reset running
    * max (no range join → single sort-based window per stream at scale).
    * @param reset optional (stream_id, t) DataFrame of reset events; rows
    *   must carry the SAME stream_id as the source rows they suppress
    *   (callers re-key a separate reset stream onto the source id)
    */
  def counterDerivative(source: DataFrame,
      maxValue: Option[Double], reset: Option[DataFrame] = None): DataFrame = {
    val delta = maxValue match {
      case Some(m) =>
        when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
          .otherwise(lit(m) - col("prev_v") + col("v"))
      case None =>
        when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
    }
    counterDerivativeCore(tagResets(source, reset), delta)
  }

  /** Set-wise V4: like [[counterDerivative]] but over MANY derived
    * streams in one job — rows are keyed by their OUTPUT stream id and
    * each stream's wrap bound joins in from the broadcast `maxValues`
    * (stream_id, max_value nullable). A null max_value reproduces the
    * maxValue=None semantics exactly: the wrap branch yields null and the
    * decrease is skipped.
    */
  def counterDerivativePerStream(source: DataFrame, maxValues: DataFrame,
      reset: Option[DataFrame] = None): DataFrame = {
    val tagged = tagResets(source, reset)
      .join(broadcast(maxValues), Seq("stream_id"), "left")
    val delta = when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
      .otherwise(col("max_value") - col("prev_v") + col("v"))
    counterDerivativeCore(tagged, delta).drop("max_value")
  }

  private def tagResets(source: DataFrame, reset: Option[DataFrame]): DataFrame =
    reset match {
      case Some(r) =>
        source.select(col("stream_id"), col("t"), col("v"), lit(false).as("is_reset"))
          .unionByName(
            r.select(col("stream_id"), col("t"),
              lit(null).cast("double").as("v"), lit(true).as("is_reset")))
      case None =>
        source.withColumn("is_reset", lit(false))
    }

  /** Shared V4 window/filter core; `delta` references v/prev_v (and any
    * column of `tagged`, e.g. a joined per-stream max_value).
    */
  private def counterDerivativeCore(tagged: DataFrame, delta: org.apache.spark.sql.Column): DataFrame = {
    // order reset rows *before* source rows at the same timestamp so a
    // coinciding reset suppresses the interval ending at that t; v as the
    // final key makes duplicate-t source runs deterministic (see
    // lagWindow)
    val w = Window.partitionBy("stream_id")
      .orderBy(col("t"), col("is_reset").desc, col("v"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val withState = tagged
      .withColumn("last_reset_t",
        max(when(col("is_reset"), col("t"))).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_t",
        last(when(!col("is_reset"), col("t")), ignoreNulls = true).over(wPrev))
      .where(!col("is_reset") && col("prev_v").isNotNull &&
             unix_timestamp(col("t")) =!= unix_timestamp(col("prev_t")) &&
             (col("last_reset_t").isNull || col("last_reset_t") <= col("prev_t")))
    withState
      .withColumn("delta", delta)
      .where(col("delta").isNotNull)
      .select(
        col("stream_id"),
        col("t"),
        (col("delta") /
          (unix_timestamp(col("t")) - unix_timestamp(col("prev_t")))).as("v"))
  }

  /** Exponentially weighted moving average per stream:
    * `ewma_1 = v_1`, `ewma_i = α·v_i + (1−α)·ewma_{i−1}` — the standard
    * monitoring smoother. The recurrence is NOT window-expressible
    * without exponential rescaling terms that overflow on long streams,
    * so each stream's sorted points fold in one `flatMapGroups` pass:
    * state is a single double, streams shard across executors by key,
    * nothing collects to the driver. A group is materialized to sort it —
    * fine for the reference's bounded per-stream history; an unbounded
    * stream belongs on the streaming path, whose GroupState fold is O(1).
    */
  /** Holt double exponential smoothing (level + trend) per stream:
    * `l_1 = x_1, b_1 = 0`; `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}` — the trend-aware
    * smoother EWMA flattens out of. Emits each stream's FINAL
    * (level, trend) — the monitoring forecast state (`level + h·trend`
    * is the h-step forecast). Same fold shape and bounded-history
    * guard as [[ewma]]; the cross-engine oracle replays the identical
    * arithmetic as a DuckDB struct `list_reduce` (drv_holt), with the
    * standard round(4) on the emitted values only. An unbounded stream
    * belongs on [[graft.streaming.Streaming.holt]]'s O(1) state.
    */
  def holt(source: DataFrame, alpha: Double, beta: Double,
      maxPointsPerStream: Int = 4_000_000): DataFrame = {
    val spark = source.sparkSession
    import spark.implicits._
    source.select(col("stream_id"), col("t"), col("v"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroups { (sid, rows) =>
        val buf = scala.collection.immutable.IndexedSeq.newBuilder[
          (String, java.sql.Timestamp, Double)]
        var n = 0
        rows.foreach { r =>
          n += 1
          if (n > maxPointsPerStream)
            throw graft.model.InvalidOperatorArguments(
              s"holt: stream $sid exceeds $maxPointsPerStream points in one " +
                "batch — use graft.streaming.Streaming.holt (O(1) state) or " +
                "raise maxPointsPerStream")
          buf += r
        }
        val sorted = buf.result().sortBy(r => (r._2.getTime, r._3))
        var l = 0.0
        var b = 0.0
        var first = true
        sorted.foreach { case (_, _, x) =>
          if (first) { l = x; b = 0.0; first = false }
          else {
            // lt inline-recomputed in the bt term EXACTLY as the oracle
            // lambda writes it — same expression, same bits
            val lt = alpha * x + (1 - alpha) * (l + b)
            b = beta * (lt - l) + (1 - beta) * b
            l = lt
          }
        }
        (sid, l, b)
      }
      .toDF("stream_id", "level", "trend")
  }

  /** Rolling-origin one-step-ahead backtest of the [[holt]] smoother —
    * the "is this forecaster any good on this stream" evaluation loop:
    * each point from the second on is predicted by the state BEFORE it
    * (`f_i = l_{i−1} + b_{i−1}`), and the per-stream error profile
    * folds in EXACT fixed point — every error quantizes to
    * `floor(e·10⁶)` / `floor(|e|·10⁶)` BIGINTs before summing, so the
    * sums are order-free and the oracle (the drv_holt recursion joined
    * one step ahead) replays them bit-for-bit. Output per stream:
    * (n_eval, mae_fp, bias_fp) — mean absolute error and signed bias,
    * both in micro-units; callers divide by n_eval.
    * Same fold/bounded-history shape as [[holt]].
    */
  def holtBacktest(source: DataFrame, alpha: Double, beta: Double,
      maxPointsPerStream: Int = 4_000_000): DataFrame = {
    val spark = source.sparkSession
    import spark.implicits._
    source.select(col("stream_id"), col("t"), col("v"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroups { (sid, rows) =>
        val buf = scala.collection.immutable.IndexedSeq.newBuilder[
          (String, java.sql.Timestamp, Double)]
        var n = 0
        rows.foreach { r =>
          n += 1
          if (n > maxPointsPerStream)
            throw graft.model.InvalidOperatorArguments(
              s"holtBacktest: stream $sid exceeds $maxPointsPerStream " +
                "points in one batch — raise maxPointsPerStream")
          buf += r
        }
        val sorted = buf.result().sortBy(r => (r._2.getTime, r._3))
        var l = 0.0
        var b = 0.0
        var first = true
        var nEval = 0L
        var mae = 0L
        var bias = 0L
        sorted.foreach { case (_, _, x) =>
          if (first) { l = x; b = 0.0; first = false }
          else {
            val e = x - (l + b)
            nEval += 1
            mae += math.floor(math.abs(e) * 1000000.0).toLong
            bias += math.floor(e * 1000000.0).toLong
            val lt = alpha * x + (1 - alpha) * (l + b)
            b = beta * (lt - l) + (1 - beta) * b
            l = lt
          }
        }
        (sid, nEval, mae, bias)
      }
      .toDF("stream_id", "n_eval", "mae_fp", "bias_fp")
  }

  /** Additive Holt–Winters (level + trend + seasonal, period `m`): the
    * seasonal extension of [[holt]] —
    *
    *   l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
    *   s_t = γ(x_t − l_t) + (1−γ) s_{t−m}
    *
    * with `l_1 = x_1, b_1 = 0` and a ZERO-initialized seasonal ring —
    * the deterministic reference-free init both engines replay (a
    * first-season-mean init would work too, but adds nothing the gate
    * can distinguish). Emits each stream's FINAL state plus the 1-step
    * forecast `l + b + s_{next phase}`. The oracle replays the fold as
    * a recursive CTE whose state row carries the ring as a LIST (the
    * drv_holt recursion with a list column — probed: DuckDB list
    * slicing/concat in recursive CTEs is bit-exact; only struct
    * list_reduce has the aliasing bug). Same bounded-history guard as
    * [[holt]]; unbounded streams belong on
    * [[graft.streaming.Streaming.holtWinters]]'s O(m) state.
    */
  def holtWinters(source: DataFrame, alpha: Double, beta: Double,
      gamma: Double, period: Int,
      maxPointsPerStream: Int = 4_000_000): DataFrame = {
    require(period >= 2, "period must be >= 2")
    val spark = source.sparkSession
    import spark.implicits._
    source.select(col("stream_id"), col("t"), col("v"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroups { (sid, rows) =>
        val buf = scala.collection.immutable.IndexedSeq.newBuilder[
          (String, java.sql.Timestamp, Double)]
        var n = 0
        rows.foreach { r =>
          n += 1
          if (n > maxPointsPerStream)
            throw graft.model.InvalidOperatorArguments(
              s"holtWinters: stream $sid exceeds $maxPointsPerStream points " +
                "in one batch — use graft.streaming.Streaming.holtWinters " +
                "(O(period) state) or raise maxPointsPerStream")
          buf += r
        }
        val sorted = buf.result().sortBy(r => (r._2.getTime, r._3))
        var l = 0.0
        var b = 0.0
        val ring = Array.fill(period)(0.0)
        var idx = 0 // 0-based point index; phase of point i is i % period
        sorted.foreach { case (_, _, x) =>
          if (idx == 0) { l = x; b = 0.0 }
          else {
            val ph = idx % period
            val sOld = ring(ph)
            // lt inline-recomputed in the bt and ring terms EXACTLY as
            // the oracle recursion writes it — same expression, same bits
            val lt = alpha * (x - sOld) + (1 - alpha) * (l + b)
            b = beta * (lt - l) + (1 - beta) * b
            ring(ph) = gamma * (x - lt) + (1 - gamma) * sOld
            l = lt
          }
          idx += 1
        }
        (sid, l, b, l + b + ring(idx % period))
      }
      .toDF("stream_id", "level", "trend", "forecast_1")
  }

  def ewma(source: DataFrame, alpha: Double,
      maxPointsPerStream: Int = 4_000_000): DataFrame = {
    val spark = source.sparkSession
    import spark.implicits._
    source.select(col("stream_id"), col("t"), col("v"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (sid, rows) =>
        // (t, v) sort: the engine path pre-aggregates to unique (stream, t)
        // so ties never occur there, but this is a public operator — the
        // value tie-break makes duplicate-timestamp input deterministic
        // instead of partition-order-dependent
        val buf = scala.collection.immutable.IndexedSeq.newBuilder[
          (String, java.sql.Timestamp, Double)]
        var n = 0
        rows.foreach { r =>
          n += 1
          // ENFORCED bounded-history precondition (was documentation-only):
          // this one-task sort buffer is the batch shape; an unbounded
          // stream belongs on graft.streaming's O(1) GroupState fold
          if (n > maxPointsPerStream)
            throw graft.model.InvalidOperatorArguments(
              s"ewma: stream $sid exceeds $maxPointsPerStream points in one " +
                "batch — use graft.streaming.Streaming.ewma (O(1) state) or " +
                "raise maxPointsPerStream")
          buf += r
        }
        val sorted = buf.result().sortBy(r => (r._2.getTime, r._3))
        var acc = 0.0
        var first = true
        sorted.iterator.map { case (_, t, v) =>
          acc = if (first) { first = false; v } else alpha * v + (1 - alpha) * acc
          (sid, t, acc)
        }
      }
      .toDF("stream_id", "t", "ewma")
  }
}
