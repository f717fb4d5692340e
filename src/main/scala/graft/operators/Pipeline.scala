package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for large-scale training-data pipelines
  * (driver north-star scope; no counterpart in the reference — SURVEY §2.4
  * "north-star extras"). These are the steps that turn a deduped corpus
  * into an actual training mix: deterministic splits, per-source caps,
  * content scrubbing, and a reproducible global shuffle.
  *
  * Scale design:
  *  - Split assignment is a pure projection (md5 of the id) — zero
  *    shuffle, stable across runs/cluster sizes/partitionings, and any
  *    engine (Spark, DuckDB, a feature store) derives the identical split,
  *    which is what makes train/test contamination auditable at 100 TB.
  *  - Per-source capping is one hash partition by source + a per-partition
  *    top-N (rank pushdown: Spark turns the row_number filter into
  *    WindowGroupLimit, so each partition keeps N rows, not the full sort).
  *  - Redaction is a codegen'd regexp_replace projection — no UDF.
  *  - Interleave is a repartitionByRange-style total order on a hash key:
  *    one range shuffle, and the output order is a deterministic function
  *    of content, not of input file layout.
  */
object Pipeline {

  /** Deterministic hash bucket in [0, 256): the first md5 byte of the id
    * rendered by its first two hex chars. String compare ≡ numeric compare
    * (fixed-width lowercase hex), so thresholds work in any SQL engine.
    */
  private def hexBucket(idCol: Column): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, 2)

  /** Assign each row a reproducible train/val/test split by hashing its id:
    * bucket < trainHex → train, < valHex → val, else test. Default 'e6'/'f3'
    * ≈ 90/5/5. Adding rows never reassigns existing ones (no sampling, no
    * global state) — the property that keeps splits stable as a corpus
    * grows.
    */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
      trainHex: String = "e6", valHex: String = "f3"): DataFrame = {
    val b = hexBucket(col(idCol))
    df.withColumn("split",
      when(b < trainHex, "train").when(b < valHex, "val").otherwise("test"))
  }

  /** Keep at most `n` rows per source, preferring the longest documents
    * (n_chars desc, id asc tiebreak). The row_number filter compiles to a
    * WindowGroupLimit: each shuffle partition retains only its top-n heap
    * instead of sorting the whole source's documents.
    */
  def capPerSource(df: DataFrame, n: Int, sourceCol: String = "source",
      orderCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= n)
  }

  /** Scrub a word-class from the text (the PII-redaction shape: the real
    * pattern would be emails/phones/ids; the mechanics — a codegen'd
    * whole-word regexp_replace projection, zero shuffle — are identical).
    */
  def redact(df: DataFrame, pattern: String, replacement: String = "<ENT>",
      textCol: String = "text"): DataFrame =
    df.withColumn("redacted",
      regexp_replace(col(textCol), s"\\b(?:$pattern)\\b", replacement))

  /** Reproducible global shuffle: total-order the corpus by a content hash
    * (md5 of source:id, id tiebreak). Physically a range shuffle +
    * per-partition sort; the resulting training order is independent of
    * input file layout and cluster size.
    */
  def interleave(df: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val key = md5(concat_ws(":", col(sourceCol), col(idCol).cast("string"))
      .cast("binary"))
    df.withColumn("shuffle_key", key).orderBy(col("shuffle_key"), col(idCol))
  }
}
