package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structural stats over graph-valued datapoints (SURVEY §1.4: value =
  * `{"v": [{"i": id}, ...], "e": [{"f": from, "t": to}, ...]}`). The
  * reference stores these opaquely (count-only downsampling); this adds
  * the natural Spark-side analytics a consumer would want — all via
  * `from_json` into typed arrays, no UDFs.
  */
object Graphs {

  val schema: StructType = StructType(Seq(
    StructField("v", ArrayType(StructType(Seq(
      StructField("i", StringType))))),
    StructField("e", ArrayType(StructType(Seq(
      StructField("f", StringType), StructField("t", StringType)))))))

  /** Per-snapshot vertex/edge counts and mean degree. Input: rows with a
    * graph JSON column. Output adds n_vertices, n_edges, mean_degree.
    */
  def snapshotStats(df: DataFrame, jsonCol: String = "v_json"): DataFrame = {
    val g = from_json(col(jsonCol), schema)
    df.withColumn("__g", g)
      .withColumn("n_vertices", coalesce(size(col("__g.v")), lit(0)))
      .withColumn("n_edges", coalesce(size(col("__g.e")), lit(0)))
      .withColumn("mean_degree",
        when(col("n_vertices") > 0,
          lit(2.0) * col("n_edges") / col("n_vertices")).otherwise(lit(0.0)))
      .drop("__g")
  }

  /** Explode a snapshot's edges for relational processing:
    * (…, edge_from, edge_to) one row per edge.
    */
  def edges(df: DataFrame, jsonCol: String = "v_json"): DataFrame =
    df.withColumn("__e", explode(from_json(col(jsonCol), schema).getField("e")))
      .withColumn("edge_from", col("__e.f"))
      .withColumn("edge_to", col("__e.t"))
      .drop("__e")

  /** Edge churn between CONSECUTIVE snapshots of each keyed graph stream:
    * per (keys, snapshot) the distinct-edge set is diffed against the
    * previous snapshot's — n_added / n_removed, with the first snapshot
    * counting all its edges as added. Snapshots with zero edges carry no
    * rows (consistent with [[edges]]). One shuffle to build the per-
    * snapshot sets, then a per-key window — the same partitioning, so
    * streams shard across executors and no snapshot is ever compared to
    * anything but its predecessor.
    */
  def churn(df: DataFrame, keys: Seq[String], snapCol: String,
      jsonCol: String = "v_json"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // edges collect as STRUCTS, not joined strings: any separator can
    // collide for some label alphabet (("a b","c") vs ("a","b c")), and
    // array_except compares struct arrays natively
    val e = edges(df, jsonCol)
      .withColumn("__edge", struct(col("edge_from"), col("edge_to")))
    val sets = e.groupBy((keys :+ snapCol).map(col): _*)
      .agg(collect_set(col("__edge")).as("__es"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(snapCol))
    sets.withColumn("__prev", lag(col("__es"), 1).over(w))
      .withColumn("n_added",
        when(col("__prev").isNull, size(col("__es")))
          .otherwise(size(array_except(col("__es"), col("__prev"))))
          .cast("long"))
      .withColumn("n_removed",
        when(col("__prev").isNull, lit(0L))
          .otherwise(size(array_except(col("__prev"), col("__es"))).cast("long")))
      .drop("__es", "__prev")
  }
}
