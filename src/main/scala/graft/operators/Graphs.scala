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
}
