package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the contract checks every
  * production table feed needs (the Deequ/expectations family), shaped
  * for 100 TB: every row-level rule family folds into ONE scan of the
  * table via conditional aggregation (adding a rule adds a column to the
  * same hash-agg pass, never a pass), uniqueness is a single
  * count-vs-distinct aggregate, and referential integrity is one
  * equi-join against the (deduped) parent keys — broadcast-able when the
  * parent is a dimension. Reports are tiny (one row per rule), so the
  * report union is metadata-scale.
  *
  * All outputs share the schema (rule, n_violations, n_checked) —
  * BIGINT counts only, engine-portable by the cross-engine decimal
  * invariant.
  */
object Quality {

  /** Row-predicate rules, ONE scan for all of them: `rules` maps rule
    * name → VIOLATION predicate (true = row violates).
    */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rowRules needs at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (n, p) =>
      sum(when(p, 1L).otherwise(0L)).as(s"__v_$n")
    }
    val stacked = rules.map { case (n, _) => s"'$n', __v_$n" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${rules.length}, $stacked) AS (rule, n_violations)",
        "__n AS n_checked")
      .select("rule", "n_violations", "n_checked")
  }

  /** Uniqueness rule: violations = surplus rows beyond one per distinct
    * key tuple (exact, one aggregate pass).
    */
  def uniquenessRule(df: DataFrame, name: String,
      keys: Seq[String]): DataFrame =
    df.agg(
        (count(lit(1)) - countDistinct(struct(keys.map(col): _*)))
          .as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))

  /** Referential-integrity rule: child rows whose `childKey` has no match
    * in the parent's `parentKey` set. One equi-join against the deduped
    * parent keys (a key-only projection — AQE broadcasts dimension-sized
    * parents).
    */
  def referentialRule(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(p, col(childKey) === col("__pk"), "left")
      .agg(sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
  }

  /** Union report over any mix of rule frames. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _).orderBy("rule")
}
