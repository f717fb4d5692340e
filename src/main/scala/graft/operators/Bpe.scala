package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over the corpus (Sennrich et al.
  * 2016 — the subword algorithm behind GPT-2/RoBERTa vocabularies), as a
  * distributed pipeline op: learning the merge table from 100 TB of text
  * is exactly the kind of corpus-wide aggregation this engine exists for.
  *
  * Scale design: training NEVER iterates the corpus. One groupBy
  * collapses the corpus to its word-frequency table (vocabulary-scale —
  * millions of rows at web scale, not billions), and every merge
  * iteration is (a) one flatMap+groupBy pair-count over that table,
  * weighted by word frequency, and (b) a TakeOrdered(1) argmax + one map
  * to apply the merge — two narrow jobs per merge on vocabulary-sized
  * data. Symbol sequences shrink monotonically, and the table is
  * localCheckpoint'd per round (iterative-lineage rule). Ties break to
  * the lexicographically smallest (a, b) so training is deterministic on
  * any cluster layout.
  *
  * Words split to characters + a terminal `</w>` marker (the classic
  * formulation: "newest" → n e w e s t </w>); merging is strict
  * left-to-right with skip-after-merge, the published overlap rule.
  */
object Bpe {

  case class WordFreq(syms: Seq[String], freq: Long)

  private val EOW = "</w>"

  /** Apply one merge (a, b) → ab to a symbol sequence, left-to-right,
    * skipping past each merge (so "aaa" under (a,a) → "aa a", never
    * "a aa" or a chain).
    */
  private[operators] def mergePair(syms: Seq[String], a: String, b: String,
      ab: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += ab; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The vocabulary-scale word-frequency table the trainer iterates on. */
  private def wordTable(docs: DataFrame, textCol: String): Dataset[WordFreq] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordFreq(w.map(_.toString) :+ EOW, f) }
  }

  /** Learn up to `nMerges` merges; stops early when the best pair's
    * corpus frequency falls below `minFreq` (a merge seen once carries no
    * generalization). Returns merges in rank order.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
      minFreq: Long = 2): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var continue = true
    while (continue && it < nMerges) {
      val top = words.flatMap(wf =>
          wf.syms.iterator.sliding(2).withPartial(false)
            .map(p => (p.head, p(1), wf.freq)).toSeq)
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val ab = a + b
        words = words.map(wf => WordFreq(mergePair(wf.syms, a, b, ab), wf.freq))
          .localCheckpoint(true)
        it += 1
      }
    }
    merges.result()
  }

  /** Encode a corpus with a learned merge table: per doc, every word is
    * split to chars+`</w>` and the merges replay in rank order (the
    * standard greedy-by-rank encoder). The merge list broadcasts with
    * the task closure (vocabulary-scale); encoding is a pure per-row map
    * over the corpus — one pass, no shuffle. Output: (id, n_words,
    * n_subwords) — the compression audit a tokenizer change ships with.
    */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = merges.toArray
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        var n = 0L
        ws.foreach { w =>
          var syms: Seq[String] = w.map(_.toString) :+ EOW
          ranked.foreach { case (a, b) =>
            if (syms.length > 1) syms = mergePair(syms, a, b, a + b)
          }
          n += syms.length
        }
        (id, ws.length.toLong, n)
      }
      .toDF(idCol, "n_words", "n_subwords")
  }
}
