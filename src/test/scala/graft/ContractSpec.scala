package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the driver contract itself: queries/oracleSql key hygiene (a
  * typo'd oracle key would silently demote its query to the weaker
  * rows-only check and strand an orphan oracle) and the entry() smoke
  * gate the driver runs (rows > 0 at sf0.001).
  */
class ContractSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every query is oracled unless on the explicit rows-only list") {
    // rows-only means the op is genuinely not SQL-expressible in DuckDB.
    // Since r5 the multimodal stub codec is md5-derived, so even mm_* are
    // oracled. text_bpe_encode is rows-only by necessity: BPE training is
    // an ITERATIVE argmax (each merge depends on the pair counts AFTER
    // the previous merge) — no fixed-depth SQL mirror exists; its
    // semantics are pinned by the hand-computed Sennrich-corpus spec
    // instead. Growing this list is a deliberate decision, not a silent
    // default. emb_pca LEFT this list in r10: its oracle splices the
    // run-captured Jacobi eigenvectors in as literals (pcaOracle), so
    // the projection hashes under the full gate — Verify dumps
    // oracle_sql.json after the queries run, which this test mirrors by
    // running emb_pca first.
    val rowsOnly = Set("text_bpe_encode")
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    SparkEntry.queries("emb_pca")(spark, "/root/testdata/sf0.001").count()
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql keys with no matching query (typo?): $orphanOracles")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == rowsOnly,
      s"queries silently missing an oracle: ${unoracled -- rowsOnly}; " +
        s"stale rows-only entries: ${rowsOnly -- unoracled}")
  }

  test("entry() flagship returns rows at sf0.001 (driver smoke gate)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  override def afterAll(): Unit = spark.stop()
}
