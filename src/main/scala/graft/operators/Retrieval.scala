package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword + hybrid retrieval over the document corpus — the lexical
  * complement to [[Similarity]]'s ANN lanes, used in training-data
  * curation for hard-negative mining and retrieval-augmented filtering.
  *
  * Scale design: BM25 never builds a doc×query cartesian — the only
  * joins are (a) query tokens × the inverted token stream (an equi-join
  * on token; candidates = docs sharing at least one query term) and
  * (b) metadata-scale broadcasts (query set, df table, corpus stats).
  * Hybrid RRF fuses two top-k lists (k rows per query each) — list-scale
  * data, one full-outer join on (qid, doc).
  */
object Retrieval {

  /** BM25 (Robertson/Lucene form) top-k: for each query row (qid, qtext),
    * the k best corpus docs by
    * `sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))`
    * with `idf = ln((N - df + 0.5) / (df + 0.5) + 1)`. Scoring touches
    * only docs sharing a term with the query (equi-join on token against
    * the inverted stream). Ranking uses the score ROUNDED to 6 decimals
    * with doc_id tie-break so last-ulp libm/sum-order differences across
    * engines cannot flip ranks (the raw sum is fp-only reproducible,
    * ~1e-15). Output: (qid, doc_id, score, rnk), score rounded.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .localCheckpoint(true) // feeds tf, dl AND df off one explode
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = toks.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val n = docs.count()
    // avgdl as the same double division on both engines: sum(dl) / N
    val avgdl = dl.agg(sum("dl")).head().getLong(0).toDouble / n
    val qtoks = queries.select(col("qid"),
        explode(array_distinct(split(col("qtext"), " "))).as("tok"))
      .where(col("tok") =!= "")
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    qtoks.join(tf, "tok") // inverted-index probe: only shared-term docs
      .join(broadcast(df), "tok")
      .join(broadcast(dl), "doc_id")
      .withColumn("term",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("qid", "doc_id")
      .agg(round(sum("term"), 6).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Reciprocal-rank fusion of two rankings (the standard hybrid-search
    * combiner): `rrf = 1/(c + rank_a) + 1/(c + rank_b)` per (qid, doc),
    * a doc absent from one list contributing only the other term. The
    * score is a fixed-order sum of two small rationals — bit-identical
    * across engines, so the fused ranking is EXACTLY reproducible (no
    * fp tolerance needed, unlike either input's raw score). Inputs are
    * (qid, doc_id, rnk) top-k lists; output (qid, doc_id, rrf, rnk).
    */
  def hybridRrf(a: DataFrame, bdf: DataFrame, k: Int,
      c: Double = 60.0): DataFrame = {
    val left = a.select(col("qid"), col("doc_id"), col("rnk").as("rnk_a"))
    val right = bdf.select(col("qid"), col("doc_id"), col("rnk").as("rnk_b"))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
    left.join(right, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("rnk_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rnk_b")), lit(0.0)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("doc_id"), col("rrf"), col("rnk"))
  }
}
