package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right value with
  * r.t <= l.t on the same key (the temporal-join primitive behind the
  * reference's V4 reset-suppression semantics, exposed as a first-class
  * operator — SURVEY §2.4 joins row).
  *
  * Implementation is union + last-known-value running window, NOT a range
  * join: one shuffle+sort per key regardless of row counts, no candidate
  * explosion — the shape that survives 100 TB (a range join would be
  * |left| × |right-per-key| pairs).
  */
object AsOf {

  /** @param left  any columns + (key, t)
    * @param right (key, t, value) — must be unique per (key, t); callers
    *              pre-aggregate duplicates or the picked row is undefined
    * @param out   name of the attached as-of value column (null when no
    *              right row precedes the left row — left-join semantics)
    */
  def join(left: DataFrame, right: DataFrame, key: String, tCol: String,
      valueCol: String, out: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__is_left", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(tCol), col(valueCol).as("__rv"))
      .withColumn("__is_left", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal t, so a same-timestamp
    // right value is visible (asof uses <=)
    val w = Window.partitionBy(key).orderBy(col(tCol), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(out, last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .select(leftCols.map(col) :+ col(out): _*)
  }

  /** Tolerance-bounded as-of join: like [[join]], but the match is only
    * kept when the right row is at most `toleranceSec` seconds older than
    * the left row — the sensor/feature-alignment rule ("use the last
    * reading unless it's stale"). Same union + running-last shape (one
    * shuffle, no candidate explosion); the matched right TIMESTAMP rides
    * along so the staleness bound is applied per row after the window.
    * `tCol` must be a timestamp column on both sides.
    */
  /** Nearest-event join (either direction): for each left row, the right
    * value whose timestamp is CLOSEST in floored epoch seconds; distance
    * ties break BACKWARD (the last reading wins over the next one — the
    * convention that keeps `r.t == l.t` matches identical to [[join]]).
    * Same union + running-window shape as [[join]], run in BOTH
    * directions over one shuffle (the forward lane is a DESC-ordered
    * GROWING frame — a CURRENT→FOLLOWING frame would shrink and
    * re-evaluate per row, the O(n²) trap). Seconds-floored distance is
    * the cross-engine-exact comparison (DuckDB epoch() is fractional).
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
      tCol: String, valueCol: String, out: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__is_left", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__rt", lit(null).cast("timestamp"))
    val r = right.select(col(key), col(tCol), col(valueCol).as("__rv"))
      .withColumn("__rt", col(tCol))
      .withColumn("__is_left", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at equal t in BOTH directions, so an
    // exactly-aligned right row is visible to each lane
    val wb = Window.partitionBy(key).orderBy(col(tCol), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(key).orderBy(col(tCol).desc, col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__bv", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wb))
      .withColumn("__fv", last(col("__rv"), ignoreNulls = true).over(wf))
      .withColumn("__ft", last(col("__rt"), ignoreNulls = true).over(wf))
      .where(col("__is_left") === 1)
      .withColumn(out,
        when(col("__bt").isNull, col("__fv"))
          .when(col("__ft").isNull, col("__bv"))
          .when(unix_timestamp(col(tCol)) - unix_timestamp(col("__bt")) <=
                unix_timestamp(col("__ft")) - unix_timestamp(col(tCol)),
            col("__bv"))
          .otherwise(col("__fv")))
      .select(leftCols.map(col) :+ col(out): _*)
  }

  def joinWithin(left: DataFrame, right: DataFrame, key: String,
      tCol: String, valueCol: String, out: String,
      toleranceSec: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__is_left", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__rt", lit(null).cast("timestamp"))
    val r = right.select(col(key), col(tCol), col(valueCol).as("__rv"))
      .withColumn("__rt", col(tCol))
      .withColumn("__is_left", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(tCol), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__lv", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__lt", last(col("__rt"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .withColumn(out, when(col("__lt").isNotNull &&
        unix_timestamp(col(tCol)) - unix_timestamp(col("__lt"))
          <= toleranceSec, col("__lv")))
      .select(leftCols.map(col) :+ col(out): _*)
  }
}
