package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding similarity search (driver north-star scope).
  *
  * Brute-force cosine top-k is the exact baseline: a broadcast nested-loop
  * of the (small) query set against the corpus — the corpus side streams
  * through codegen'd array arithmetic, no shuffle of vectors. The LSH
  * variant buckets by random-hyperplane sign bits so each query only meets
  * its bucket — the 100 TB path.
  */
object Similarity {

  /** Dot product of two array<double> columns as a codegen'd fold. */
  def dot(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  /** Exact cosine top-k: for each row of `queries` (qid, qemb), the k
    * nearest rows of `corpus` (vec_id, emb) by cosine similarity.
    * Output: (qid, cid, rnk, sim).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = queries
      .join(corpus, col("vec_id") =!= col("qid"))  // broadcast NLJ: tiny query side
      .withColumn("sim",
        dot("qemb", "emb") / (sqrt(dot("qemb", "qemb")) * sqrt(dot("emb", "emb"))))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("cid"), col("rnk"), col("sim"))
  }

  /** Random-hyperplane LSH bucketing: sign-bit signature over `planes`
    * deterministic pseudo-random hyperplanes (seeded by dimension index —
    * no Date.now/rand, reproducible across runs). Vectors agreeing on the
    * full signature land in one bucket; ANN search joins per bucket instead
    * of all-pairs. Returns (vec_id, bucket).
    */
  def lshBuckets(corpus: DataFrame, dim: Int, planes: Int = 16): DataFrame = {
    // plane p component j = hash-based pseudo-random in [-1, 1)
    def comp(p: Int, j: Int): Double = {
      val h = scala.util.hashing.MurmurHash3.productHash((p, j))
      (h.toDouble / Int.MaxValue)
    }
    val bits = (0 until planes).map { p =>
      val terms = (0 until dim).map(j => s"emb[$j] * ${comp(p, j)}").mkString(" + ")
      s"CASE WHEN ($terms) >= 0 THEN ${1L << p}L ELSE 0L END"
    }
    corpus.withColumn("bucket", expr(bits.mkString(" + ")))
      .select(col("vec_id"), col("bucket"))
  }

  /** ANN cosine top-k via LSH buckets: exact rerank inside each bucket. */
  def annTopK(corpus: DataFrame, dim: Int, k: Int, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = lshBuckets(corpus, dim, planes)
    val withB = corpus.join(b, "vec_id")
    val pairs = withB.select(col("vec_id").as("qid"), col("emb").as("qemb"), col("bucket"))
      .join(withB.select(col("vec_id"), col("emb"), col("bucket")), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        dot("qemb", "emb") / (sqrt(dot("qemb", "qemb")) * sqrt(dot("emb", "emb"))))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("cid"), col("rnk"), col("sim"))
  }
}
