package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd+ args: query names to dump (default all) — lets local
    // iteration re-check one query without a full 106-query dump.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // native fns + the size(split)->graft_ntokens optimizer rule, installed
    // up front so every query plans identically regardless of run order
    graft.functions.GraftFunctions.register(spark)
    graft.core.DatapointStore.fsFor(outDir)
      .mkdirs(new org.apache.hadoop.fs.Path(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // provenance stamp (r16 ADVICE): the compare's mtime-only staleness
    // guard false-positives after a git checkout (mtimes rewritten on
    // unchanged files). Stamp the dump with the builder tree's SHA +
    // dirty flag so compare_oracle.py can prove freshness by identity:
    // equal clean SHAs ⇒ fresh regardless of mtimes. Best-effort — a
    // missing stamp just falls back to the mtime guard.
    try {
      def git(cmd: String*): String = {
        val p = new ProcessBuilder(("git" +: cmd): _*)
          .redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        p.waitFor(); out
      }
      val sha = git("rev-parse", "HEAD")
      val dirty = git("status", "--porcelain").nonEmpty
      Files.writeString(Paths.get(s"$outDir/_verify_meta.json"),
        s"""{"sha": ${q(sha)}, "dirty": $dirty}""")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] meta stamp failed: $e") }
    spark.stop()
  }
}
