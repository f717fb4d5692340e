package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-pinned source readers (SURVEY §2.4 scans/sources row). Parquet
  * is the native format; CSV and JSONL cover ingest from upstream dumps.
  *
  * Everything takes an EXPLICIT schema: at 100 TB, schema inference is a
  * full extra pass over the data (CSV/JSON) or a footer sample that can
  * mis-type sparse columns — and a pinned schema is what lets empty or
  * partially-written directories read as zero rows instead of failing
  * inference (same rule as the datapoint store).
  */
object Sources {

  /** Batch read of `format` ∈ {parquet, orc, csv, jsonl} with the schema
    * pinned. CSV is header-tolerant and strict (FAILFAST) — silently
    * null-ing malformed rows (PERMISSIVE) corrupts aggregates downstream;
    * a 100 TB ingest wants the bad file identified, not absorbed.
    */
  def read(spark: SparkSession, path: String, format: String,
      schema: StructType, strict: Boolean = true): DataFrame = {
    val mode = if (strict) "FAILFAST" else "PERMISSIVE"
    format match {
      case "parquet" => spark.read.schema(schema).parquet(path)
      case "orc" => spark.read.schema(schema).orc(path)
      case "csv" => spark.read.schema(schema)
        .option("header", "true").option("mode", mode).csv(path)
      case "jsonl" => spark.read.schema(schema)
        .option("mode", mode).json(path)
      // raw line corpus (one document per line — the commonest LLM text
      // drop): the source's schema is fixed at (value STRING); the
      // pinned-schema contract is honored by selecting INTO the caller's
      // single string column
      case "text" =>
        require(schema.fields.length == 1 &&
          schema.fields.head.dataType == org.apache.spark.sql.types.StringType,
          s"text source needs a single string column, got $schema")
        spark.read.text(path)
          .select(org.apache.spark.sql.functions.col("value")
            .as(schema.fields.head.name))
      case other => throw new IllegalArgumentException(
        s"unsupported source format: $other")
    }
  }

  /** Streaming file source over a directory: new files are discovered per
    * micro-batch, schema pinned (required by Structured Streaming anyway).
    * `maxFilesPerTrigger` bounds per-batch work so one bulk drop of
    * history does not become a single giant micro-batch. Strict (FAILFAST)
    * by default for the same reason as [[read]] — in PERMISSIVE mode a
    * corrupt line becomes an all-null row that surfaces far downstream as
    * a baffling null-key failure (e.g. `StreamNotFound(null)` inside the
    * store ingest) instead of naming the bad file.
    */
  def stream(spark: SparkSession, dir: String, format: String,
      schema: StructType, maxFilesPerTrigger: Int = 100,
      strict: Boolean = true): DataFrame = {
    val mode = if (strict) "FAILFAST" else "PERMISSIVE"
    val r = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    format match {
      case "parquet" => r.parquet(dir)
      case "orc" => r.orc(dir)
      case "csv" => r.option("header", "true").option("mode", mode).csv(dir)
      case "jsonl" => r.option("mode", mode).json(dir)
      case "text" =>
        require(schema.fields.length == 1 &&
          schema.fields.head.dataType == org.apache.spark.sql.types.StringType,
          s"text source needs a single string column, got $schema")
        // fresh builder: the text source's schema is fixed at (value) —
        // pinning the caller's schema on the reader would be rejected
        spark.readStream
          .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
          .text(dir)
          .select(org.apache.spark.sql.functions.col("value")
            .as(schema.fields.head.name))
      case other => throw new IllegalArgumentException(
        s"unsupported source format: $other")
    }
  }

  /** Batch read of raw media files as (path, modificationTime, length,
    * content binary) — Spark's binaryFile source, the ingestion mouth of
    * the multimodal pipeline ([[graft.operators.Multimodal]] consumes the
    * content column). `pathGlobFilter` selects by extension; files larger
    * than `maxBytes` are REJECTED up front (binaryFile materializes each
    * file as one row, so a stray multi-GB object would OOM an executor —
    * a 100 TB media ingest splits oversized assets upstream).
    */
  def readBinary(spark: SparkSession, dir: String,
      pathGlobFilter: String = "*", maxBytes: Long = 256L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlobFilter).load(dir)
    val over = df.where(col("length") > maxBytes).select("path", "length")
      .limit(1).collect()
    over.headOption.foreach { r =>
      throw new IllegalArgumentException(
        s"readBinary: ${r.getString(0)} is ${r.getLong(1)} bytes " +
          s"(> $maxBytes); split or filter oversized media upstream")
    }
    df
  }
}
