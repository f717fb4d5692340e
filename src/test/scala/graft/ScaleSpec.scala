package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scale-technique demonstrations with plan-level assertions: bucketed
  * co-located joins (no shuffle) and salted distinct counts (exactness).
  */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val warehouse = Files.createTempDirectory("graft-wh").toString
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed tables join without a shuffle (co-located join)") {
    import spark.implicits._
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("okey", "odata")
    val items = (1L to 5000L).map(i => (i % 1000 + 1, i.toDouble)).toDF("okey", "qty")
    orders.write.bucketBy(4, "okey").sortBy("okey")
      .mode("overwrite").saveAsTable("b_orders")
    items.write.bucketBy(4, "okey").sortBy("okey")
      .mode("overwrite").saveAsTable("b_items")
    // force the non-broadcast path (the case bucketing exists for: two
    // FACT-sized tables) so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_items"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing unused in:\n$plan")
      // both sides bucketed on the join key -> no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 5000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted distinct count is exact under a hot key") {
    import spark.implicits._
    // hot key "h" carries 10k distinct values; cold keys carry few
    val rows = (1 to 10000).map(i => ("h", s"v$i")) ++
      (1 to 50).map(i => (s"k${i % 5}", s"v${i % 7}"))
    val df = rows.toDF("k", "v")
    val salted = graft.operators.Skew.saltedDistinctCount(df, "k", "v", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted("h") == 10000)
  }

  test("approx_count_distinct sketch lands within 5% of exact") {
    import spark.implicits._
    val df = (1 to 20000).map(i => i % 7919).toDF("v")
    val approx = df.agg(approx_count_distinct("v")).collect().head.getLong(0)
    val exact = df.agg(countDistinct("v")).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("nested-tag json-path stream lookup") {
    val store = new graft.core.Datastream(spark,
      java.nio.file.Files.createTempDirectory("graft-nested").toString)
    store.ensureStream(Map("name" -> "n1", "meta.region" -> "eu"))
    store.ensureStream(Map("name" -> "n2", "meta.region" -> "us"))
    // flat keys containing dots are stored verbatim in the tag doc; the
    // json-path variant must resolve them via bracket paths (a naive
    // $.meta.region path would treat the dot as nesting and match nothing)
    assert(store.findStreams(Map("meta.region" -> "eu")).count() == 1)
    assert(store.findStreamsByJsonPath("meta.region", "eu").count() == 1)
    assert(store.findStreamsByJsonPath("meta.region", "nope").count() == 0)
    // tag values with quotes/backslashes survive the JSON round trip
    val q = store.ensureStream(Map("name" -> "n3", "note" -> """say "hi" \o/"""))
    assert(store.findStreamsByJsonPath("note", """say "hi" \o/""").count() == 1)
    assert(store.getTags(q)("note") == """say "hi" \o/""")
  }

  override def afterAll(): Unit = spark.stop()
}
