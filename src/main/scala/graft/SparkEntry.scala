package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Granularity
import graft.operators.{Dedup, Derive, Downsample, Similarity, TextStats}

/** Driver contract (SURVEY §7): one `queries` entry per implemented
  * operator, each with a DuckDB-equivalent `oracleSql` on the same parquet
  * tables. Column names and row order are pinned identically on both sides.
  *
  * Oracle-exactness notes:
  *  - `events.ts` carries microsecond fractions; the engine's append path
  *    floors to the stream's highest granularity (seconds), so every
  *    stream-shaped query floors ts on BOTH sides
  *    (`floor(epoch(ts))` in DuckDB = `unix_timestamp` in Spark).
  *  - DuckDB `sum(BIGINT)` is HUGEINT and `len(...)` is BIGINT — both sides
  *    are cast so output schemas agree.
  *  - std_dev uses the reference's naive `sqrt(q/c − m²)` formula in both
  *    engines (never Spark's Welford `stddev_pop`).
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet holds INT64 TIMESTAMP(NANOS) which Spark 4 refuses to
    * read natively — pin the schema to read nanos as long, then surface a
    * proper micros timestamp. Works under any SparkSession (no legacy
    * config needed), so the driver's own session can call entry().
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    s.read.schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** events reshaped into the reference's stream model: one stream per
    * (user_id, event_type), ts floored to seconds (highest_granularity).
    */
  private def eventStreams(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      concat_ws(":", col("user_id"), col("event_type")).as("stream_id"),
      timestamp_seconds(unix_timestamp(col("ts"))).as("t"),
      col("value").as("v"))

  /** Deterministic per-(stream, second) points: same-second values summed
    * so lag-based derive ops have a total order (ties would otherwise make
    * lag() nondeterministic in both engines).
    */
  private def pointStreams(s: SparkSession, dir: String): DataFrame =
    eventStreams(s, dir).groupBy("stream_id", "t").agg(sum("v").as("v"))

  /** Synthetic wrapping counter per stream: running sum of v mod 1000
    * (FIXTURES §2 — exercises V3/V4 on realistic wrap patterns).
    */
  private def counterStreams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("stream_id").orderBy("t")
    pointStreams(s, dir).withColumn("v", sum(col("v")).over(w) % 1000.0)
  }

  private val srcSql =
    """src AS (SELECT concat(user_id, ':', event_type) AS stream_id,
      |  CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS t, value AS v
      |  FROM events)""".stripMargin

  private val pointSql =
    """pts AS (SELECT stream_id, t, sum(v) AS v FROM src GROUP BY stream_id, t)"""

  private val counterSql =
    """ctr AS (SELECT stream_id, t,
      |  fmod(sum(v) OVER (PARTITION BY stream_id ORDER BY t
      |       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1000) AS v
      |  FROM pts)""".stripMargin

  /** Flagship: the full engine end-to-end on sf0.001 — ensure streams from
    * events, bulk-append, materialize the rollup ladder, read back
    * Minutes10 aggregates joined with stream tags.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val ds = new graft.core.Datastream(spark, work)
    val ev = events(spark, dir).where(col("user_id") < 3)
    val keys = ev.select("user_id", "event_type").distinct().collect()
    val idOf: Map[String, String] = keys.map { r =>
      val (u, et) = (r.getLong(0).toString, r.getString(1))
      s"$u:$et" -> ds.ensureStream(
        Map("user" -> u, "type" -> et, "source" -> "events"))
    }.toMap
    val uuidOf = typedLit(idOf)
    ds.appendMultiple(ev.select(
      uuidOf(concat_ws(":", col("user_id"), col("event_type"))).as("stream_id"),
      col("ts").as("t"), col("value").as("v")), checkTimestamp = false)
    ds.downsampleStreams(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    ds.datapoints.where(col("granularity") === "minutes10")
      .join(ds.streams.select(col("stream_id"), col("tags")), "stream_id")
      .select(col("stream_id"), col("t"), col("c"), col("s"), col("m"),
        element_at(col("tags"), "type").as("event_type"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational surface (SURVEY §2.4) -----------------------------

    "q1_pricing_summary" -> { (s, dir) =>
      tbl(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_shipping_priority" -> { (s, dir) =>
      val c = tbl(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = tbl(s, dir, "orders").where(col("o_orderdate") < lit("1998-01-01"))
      val l = tbl(s, dir, "lineitem").where(col("l_shipdate") > lit("1998-01-01"))
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    "q5_local_supplier" -> { (s, dir) =>
      val r = tbl(s, dir, "region").where(col("r_name") === "ASIA")
      val joined = broadcast(r)
        .join(tbl(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(tbl(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(tbl(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(tbl(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
      joined.where(col("o_orderdate") < lit("1999-01-01"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("n_name")
    },

    "q_window_top_orders" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    },

    "q_rollup_lineitem" -> { (s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    "q_intersect_custkeys" -> { (s, dir) =>
      val o = tbl(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    "q_anti_no_big_orders" -> { (s, dir) =>
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").where(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "q_semi_open_orders" -> { (s, dir) =>
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    "q_scalar_funcs" -> { (s, dir) =>
      tbl(s, dir, "orders")
        .where(col("o_orderpriority").like("%URGENT") &&
          col("o_totalprice").between(1000, 200000))
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("mo"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("pri"),
          when(col("o_orderstatus") === "F", "done")
            .otherwise("open").as("status_class"),
          floor(col("o_totalprice")).as("price_floor"))
        .orderBy("o_orderkey")
    },

    "q_in_between" -> { (s, dir) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by every output column for a deterministic row order
      tbl(s, dir, "lineitem")
        .where(col("l_quantity").between(10, 20) &&
          col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ---- datastream surface (SURVEY §2.2/§2.3 over events) ------------

    "ds_agg_minutes10" -> { (s, dir) =>
      Downsample.toGranularity(eventStreams(s, dir), Granularity.Minutes10)
        .select("stream_id", "t", "c", "s", "q", "l", "u", "m", "d",
          "t_first", "t_last", "t_mean")
        .orderBy("stream_id", "t")
    },

    "ds_fold_hours" -> { (s, dir) =>
      // hierarchical fold: raw -> minutes partials -> hours (scale path:
      // coarse levels never re-read raw history). t_mean excluded: the
      // fold floors per-minute means first (documented 1s quantization).
      Downsample.foldToCoarser(
          Downsample.toGranularity(eventStreams(s, dir), Granularity.Minutes),
          Granularity.Hours)
        .select("stream_id", "t", "c", "s", "q", "l", "u", "m", "d",
          "t_first", "t_last")
        .orderBy("stream_id", "t")
    },

    "drv_derivative" -> { (s, dir) =>
      Derive.derivative(pointStreams(s, dir)).orderBy("stream_id", "t")
    },

    "drv_counter_reset" -> { (s, dir) =>
      Derive.counterReset(counterStreams(s, dir)).orderBy("stream_id", "t")
    },

    "drv_counter_derivative" -> { (s, dir) =>
      Derive.counterDerivative(counterStreams(s, dir), Some(1000.0))
        .orderBy("stream_id", "t")
    },

    // ---- LLM-pipeline surface (north-star extras) ---------------------

    "doc_stats" -> { (s, dir) =>
      tbl(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          avg("n_chars").as("avg_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
        .orderBy("lang", "source")
    },

    "doc_token_stats" -> { (s, dir) =>
      TextStats.tokenStats(tbl(s, dir, "documents")).orderBy("doc_id")
    },

    "doc_quality" -> { (s, dir) =>
      TextStats.qualityStats(tbl(s, dir, "documents")).orderBy("doc_id")
    },

    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(tbl(s, dir, "documents")).orderBy("h")
    },

    "dedup_minhash" -> { (s, dir) =>
      // no SQL oracle (rows-only check): LSH banding is not expressible in
      // DuckDB SQL. Near-dups are injected deterministically (FIXTURES §2):
      // docs 0..19 get a variant with the first 2 words replaced.
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val variants = docs.where(col("doc_id") < 20).select(
        (col("doc_id") + 1000000).as("doc_id"),
        concat(lit("zz yy "),
          expr("concat_ws(' ', slice(split(text, ' '), 3, 1000000))")).as("text"))
      Dedup.nearDuplicates(docs.unionByName(variants), threshold = 0.3)
        .orderBy("doc_a", "doc_b")
    },

    "emb_topk_cosine" -> { (s, dir) =>
      val e = tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"))
      Similarity.cosineTopK(e, broadcast(q), 5)
        .withColumn("sim", round(col("sim"), 6))
        .orderBy("qid", "rnk")
    })

  def oracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
        |  AND n_nationkey = c_nationkey AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q_rollup_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_intersect_custkeys" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_anti_no_big_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_open_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  upper(substr(o_orderpriority, 1, 3)) AS pri,
        |  CASE WHEN o_orderstatus = 'F' THEN 'done' ELSE 'open' END AS status_class,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor
        |FROM orders
        |WHERE o_orderpriority LIKE '%URGENT'
        |  AND o_totalprice BETWEEN 1000 AND 200000
        |ORDER BY o_orderkey""".stripMargin,

    "q_in_between" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "ds_agg_minutes10" ->
      s"""WITH $srcSql,
        |b AS (SELECT stream_id, CAST(floor(epoch(t) / 600) * 600 AS BIGINT) AS be, t, v FROM src)
        |SELECT stream_id, CAST(to_timestamp(be) AS TIMESTAMP) AS t,
        |  count(v) AS c, sum(v) AS s, sum(v * v) AS q,
        |  min(v) AS l, max(v) AS u,
        |  sum(v) / count(v) AS m,
        |  sqrt(greatest(sum(v * v) / count(v)
        |    - (sum(v) / count(v)) * (sum(v) / count(v)), 0)) AS d,
        |  min(t) AS t_first, max(t) AS t_last,
        |  CAST(to_timestamp(be + CAST(floor(avg(epoch(t) - be)) AS BIGINT)) AS TIMESTAMP) AS t_mean
        |FROM b GROUP BY stream_id, be
        |ORDER BY stream_id, be""".stripMargin,

    "ds_fold_hours" ->
      s"""WITH $srcSql,
        |b AS (SELECT stream_id, CAST(floor(epoch(t) / 3600) * 3600 AS BIGINT) AS be, t, v FROM src)
        |SELECT stream_id, CAST(to_timestamp(be) AS TIMESTAMP) AS t,
        |  count(v) AS c, sum(v) AS s, sum(v * v) AS q,
        |  min(v) AS l, max(v) AS u,
        |  sum(v) / count(v) AS m,
        |  sqrt(greatest(sum(v * v) / count(v)
        |    - (sum(v) / count(v)) * (sum(v) / count(v)), 0)) AS d,
        |  min(t) AS t_first, max(t) AS t_last
        |FROM b GROUP BY stream_id, be
        |ORDER BY stream_id, be""".stripMargin,

    "drv_derivative" ->
      s"""WITH $srcSql, $pointSql,
        |d AS (SELECT stream_id, t, v,
        |    lag(v) OVER (PARTITION BY stream_id ORDER BY t) AS pv,
        |    lag(t) OVER (PARTITION BY stream_id ORDER BY t) AS pt
        |  FROM pts)
        |SELECT stream_id, t, (v - pv) / (epoch(t) - epoch(pt)) AS v
        |FROM d WHERE pv IS NOT NULL AND epoch(t) != epoch(pt)
        |ORDER BY stream_id, t""".stripMargin,

    "drv_counter_reset" ->
      s"""WITH $srcSql, $pointSql, $counterSql,
        |d AS (SELECT stream_id, t, v,
        |    lag(v) OVER (PARTITION BY stream_id ORDER BY t) AS pv
        |  FROM ctr)
        |SELECT stream_id, t, CAST(1.0 AS DOUBLE) AS v
        |FROM d WHERE pv IS NOT NULL AND v < pv
        |ORDER BY stream_id, t""".stripMargin,

    "drv_counter_derivative" ->
      s"""WITH $srcSql, $pointSql, $counterSql,
        |d AS (SELECT stream_id, t, v,
        |    lag(v) OVER (PARTITION BY stream_id ORDER BY t) AS pv,
        |    lag(t) OVER (PARTITION BY stream_id ORDER BY t) AS pt
        |  FROM ctr)
        |SELECT stream_id, t,
        |  (CASE WHEN v >= pv THEN v - pv ELSE 1000 - pv + v END)
        |    / (epoch(t) - epoch(pt)) AS v
        |FROM d WHERE pv IS NOT NULL AND epoch(t) != epoch(pt)
        |ORDER BY stream_id, t""".stripMargin,

    "doc_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  avg(n_chars) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "doc_token_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
        |  len(list_distinct(string_split(text, ' ')))
        |    / len(string_split(text, ' ')) AS ttr
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "doc_quality" ->
      """SELECT doc_id,
        |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with')))
        |    AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
        |  (length(text) - len(string_split(text, ' ')) + 1)
        |    / len(string_split(text, ' ')) AS mean_word_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS dup_count, min(doc_id) AS keep_id
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY h""".stripMargin,

    "emb_topk_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10),
        |p AS (SELECT qid, e.vec_id AS cid,
        |    list_dot_product(qemb, emb)
        |      / (sqrt(list_dot_product(qemb, qemb)) * sqrt(list_dot_product(emb, emb))) AS sim
        |  FROM q, e WHERE e.vec_id <> qid),
        |r AS (SELECT qid, cid, sim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rnk
        |  FROM p)
        |SELECT qid, cid, rnk, round(sim, 6) AS sim
        |FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin)
}
