package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution (record linkage): find records that denote the
  * same real-world entity despite surface differences (typos, variant
  * spellings), without ever comparing all record pairs.
  *
  * Scale design — the three standard ER reductions, composed:
  *  1. VALUE-level matching: comparisons run on DISTINCT attribute values,
  *     not records. A 100 TB corpus has billions of rows but a far smaller
  *     value space (names, addresses, titles); matching values first and
  *     broadcasting the match table back is what makes fuzzy joins
  *     feasible at all.
  *  2. BLOCKING: candidate pairs come from an equi-join on a cheap block
  *     key (phonetic code, token, prefix), never a cross join. Work per
  *     block is quadratic in BLOCK size only, and `maxBlock` purges
  *     pathological blocks up front (block purging — a block so big the
  *     key carries no information is noise, the JedAI/Dedupe default).
  *  3. Cheap-before-expensive: a length-band filter (|len(a)-len(b)| <=
  *     maxDist, a Levenshtein lower bound) prunes candidates before the
  *     O(len²) edit-distance kernel runs.
  *
  * Levenshtein is Spark's codegen'd built-in — unit-cost edit distance,
  * reproduced exactly by DuckDB's `levenshtein` — so match sets are
  * engine-portable (pinned by the er_fuzzy_parts oracle).
  */
object Resolve {

  /** Match near-identical values: `values` must carry (`valueCol`,
    * `blockCol`); duplicates are fine (distinct applied). Output one row
    * per unordered candidate pair that passes the edit-distance gate:
    * (val_a, val_b, dist) with val_a < val_b.
    */
  def fuzzyValuePairs(values: DataFrame, valueCol: String,
      blockCol: String, maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    val v = values.select(col(valueCol).as("val"), col(blockCol).as("blk"))
      .distinct()
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("blk")))
      .where(col("__n") <= maxBlock)
      .select("val", "blk")
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.val") < col("b.val") &&
          abs(length(col("a.val")) - length(col("b.val"))) <= maxDist)
      .select(col("a.val").as("val_a"), col("b.val").as("val_b"),
        levenshtein(col("a.val"), col("b.val")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Record-level resolution: every record gets an `entity_id` — the
    * minimum value of its fuzzy-match cluster (connected components over
    * the value-pair graph; unmatched values are their own entity).
    *
    * The label-propagation rounds run on the VALUE graph (tiny by
    * reduction 1), and the value→entity map joins back to records as a
    * broadcast. Output: input rows + entity_id.
    */
  def resolveEntities(df: DataFrame, valueCol: String, blockCol: String,
      maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    // CC's convergence probe sums labels numerically, so string values
    // ride through it as their 60-bit md5 keys (collision odds are
    // birthday(2^60) on the DISTINCT-VALUE space — vanishing at any
    // realistic vocabulary); the cluster's entity label is then the MIN
    // VALUE among members, recovered after propagation.
    def h(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val pairs = fuzzyValuePairs(df, valueCol, blockCol, maxDist, maxBlock)
      .select(h(col("val_a")).as("h_a"), h(col("val_b")).as("h_b"))
    val cc = Dedup.connectedComponents(pairs, "h_a", "h_b")
      .select(col("doc_id").as("__h"), col("rep_id").as("__rep"))
    val vals = df.select(col(valueCol).as("__v")).distinct()
      .withColumn("__h", h(col("__v")))
      .join(broadcast(cc), Seq("__h"), "left")
      .withColumn("__rep", coalesce(col("__rep"), col("__h")))
    val entity = vals.groupBy("__rep").agg(min(col("__v")).as("entity_id"))
    val valToEntity = vals.join(entity, "__rep")
      .select(col("__v").as(valueCol), col("entity_id"))
    df.join(broadcast(valToEntity), Seq(valueCol), "left")
  }
}
