package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase timings for the co-purchase graph pipeline (the bench
  * top band: triangles / jaccard / BFS all rebuild these edges). Wall
  * times under local[32]; compare phases, not absolutes.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfileGraph"
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    phase("warm scan")(li.count())

    val items = li.select(col("l_orderkey").as("__g"), col("l_partkey").as("__i"))
      .distinct()
    phase("distinct")(items.localCheckpoint(true).count())
    val itemsC = items.localCheckpoint(true)

    val bounded = itemsC.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("__g")))
      .where(col("__n") <= 1000).drop("__n")
    phase("window guard")(bounded.localCheckpoint(true).count())

    val pairs = bounded.as("a").join(bounded.as("b"),
        col("a.__g") === col("b.__g") && col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("u"), col("b.__i").as("v"))
    phase("pair join")(pairs.count())

    val edges = pairs.groupBy("u", "v").agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
    phase("pair groupBy+filter")(edges.localCheckpoint(true).count())

    val full = operators.Graphs.cooccurrenceEdges(li, "l_orderkey", "l_partkey")
    phase("cooccurrenceEdges e2e")(full.count())
    phase("cooccurrenceEdges again")(full.count())
    spark.stop()
  }
}
