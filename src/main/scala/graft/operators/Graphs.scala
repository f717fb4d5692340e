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

  /** Weighted PageRank by integer-exact power iteration. Floats are
    * banned on purpose: cross-engine float summation order differs, so an
    * auditable rank needs arithmetic any engine reproduces bit-for-bit.
    * Ranks live on a fixed-point scale (default 10^12); every step is
    * BIGINT floor division:
    *
    *   n        = |vertices|,  r0(v) = scale div n
    *   contrib  = (r(u) * w(u->v)) div outW(u)
    *   r'(v)    = ((scale div n) * (dampDen - dampNum)) div dampDen
    *              + (dampNum * sum(contrib into v)) div dampDen
    *
    * Dangling vertices (no out-edges) leak their mass — the standard
    * "leaky" simplification; ranks then UNDER-estimate slightly but stay
    * deterministic and monotone in link structure. Overflow-safe while
    * scale * max(w) < 2^63 and dampNum * scale * n_in < 2^63.
    *
    * Scale shape: each iteration is one equi-join of ranks to edges on
    * src + one hash aggregation on dst — O(E) shuffled per round, no
    * driver iteration over vertices; the edge/out-weight frame is
    * localCheckpoint'd once (it is re-read every round — the self-join
    * re-run rule). Input: (src, dst, w:<BIGINT-able>); output (v, rank).
    */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
        col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy("src").agg(sum("w").as("out_w"))
    val ew = e.join(outW, "src").localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint(true)
    val n = verts.count()
    val basePart = (scale / n) * (dampDen - dampNum) / dampDen
    var ranks = verts.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      val inflow = ew.join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"),
          expr("(rank * w) div out_w").as("contrib"))
        .groupBy("v").agg(sum("contrib").as("inflow"))
      ranks = verts.join(inflow, Seq("v"), "left")
        .select(col("v"),
          (lit(basePart) +
            expr(s"($dampNum * coalesce(inflow, 0L)) div $dampDen"))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg) by INTEGER-exact power
    * iteration — the [[pageRank]] discipline applied to the two-score
    * mutual recursion: `auth_v = Σ_{u→v} w·hub_u`, `hub_u = Σ_{u→v}
    * w·auth_v`, each side renormalized to ~`scale` total per round with
    * BIGINT floor division ONLY (`x div greatest(1, Σx div scale)`), so
    * every intermediate is a deterministic integer and the DuckDB
    * oracle replays the rounds bit-for-bit (float normalization would
    * diverge by summation order). Magnitude audit: scores ≤ ~scale
    * after each renorm, so per-round products are ≤ Σw·scale — with
    * the default 1e9 scale that leaves 9 orders of headroom in a Long
    * for Σw (edge-weight mass), far above any per-graph weight total
    * the engine's bounded-basket edge builders produce.
    *
    * Scale shape: two keyed join+agg shuffles per round on the edge
    * list, rank state is one row per vertex, each round's frames
    * localCheckpoint (iterative-lineage rule); the 1-row total joins in
    * by broadcast cross join.
    */
  def hits(edges: DataFrame, iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
        col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint(true)
    var hubs = verts.withColumn("hub", lit(scale)).localCheckpoint(true)
    var auths = verts.withColumn("auth", lit(0L))
    def renorm(raw0: DataFrame, c: String): DataFrame = {
      // raw feeds the total AND the join — checkpoint or its join+agg
      // subtree plans twice (the Union-subtree rule); the 1-row total
      // then rides as a driver literal, no broadcast exchange
      val raw = raw0.localCheckpoint(true)
      val q = raw.agg(expr(s"greatest(1L, sum($c) div $scale)"))
        .head().getLong(0)
      verts.join(raw, Seq("v"), "left")
        .select(col("v"), expr(s"coalesce($c, 0L) div ${q}L").as(c))
        .localCheckpoint(true)
    }
    for (_ <- 1 to iters) {
      auths = renorm(
        e.join(hubs.withColumnRenamed("v", "src"), "src")
          .select(col("dst").as("v"), (col("w") * col("hub")).as("auth"))
          .groupBy("v").agg(sum("auth").as("auth")),
        "auth")
      hubs = renorm(
        e.join(auths.withColumnRenamed("v", "dst"), "dst")
          .select(col("src").as("v"), (col("w") * col("auth")).as("hub"))
          .groupBy("v").agg(sum("hub").as("hub")),
        "hub")
    }
    verts.join(hubs, "v").join(auths, "v")
      .select(col("v"), col("hub"), col("auth"))
  }

  /** Co-occurrence (market-basket) edges: items sharing a group become an
    * undirected edge (u < v) kept when it appears in >= `minSupport`
    * groups. The support threshold is what keeps the graph sparse as the
    * corpus grows — one-off co-occurrences are noise AND the bulk of the
    * pairs (measured here: sf0.1 co-purchase drops 1.2M → 3.6k edges at
    * support 2).
    *
    * Scale shape: pair generation is a self-equi-join on the group key,
    * so work per group is quadratic in BASKET size, not corpus size —
    * `maxBasket` drops pathological baskets up front (block-purging, the
    * standard ER/basket guard; TPC-H orders have <= 7 lines so the
    * default never fires). One (group) shuffle + one (u,v) count shuffle.
    */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasket: Int = 1000): DataFrame = {
    // basket-collect + map-side pair explode: ONE shuffle builds the
    // per-basket distinct item set (collect_set partial-aggregates
    // map-side), pairs are generated inside the scan from the sorted
    // array (u < v by construction), and the only other shuffle is the
    // (u, v) support count. The previous formulation (distinct →
    // per-basket window → basket self-join) paid three shuffles plus an
    // SMJ whose sort keys were the full candidate-pair stream — measured
    // 2× the CPU of this shape at sf0.1 across the five co-purchase
    // queries. maxBasket still bounds the per-row pair fan-out (k²/2),
    // which is the skew guard that makes the explode safe on power-law
    // baskets.
    graft.functions.GraftFunctions.register(df.sparkSession)
    // integer item ids (the fact-table case) take the native
    // graft_pairs codegen loop; other item types fall back to the
    // equivalent higher-order-function pair generation (same sorted
    // u < v contract), trading speed for genericity
    val itemT = df.schema(itemCol).dataType
    val fastPath = itemT == org.apache.spark.sql.types.LongType ||
      itemT == org.apache.spark.sql.types.IntegerType
    val itemCast = if (fastPath) col(itemCol).cast("long") else col(itemCol)
    val baskets = df.select(col(groupCol).as("__g"), itemCast.as("__i"))
      .groupBy("__g").agg(sort_array(collect_set(col("__i"))).as("__items"))
      .where(size(col("__items")).between(2, maxBasket))
    val pairs =
      if (fastPath) baskets.select(explode(expr("graft_pairs(__items)")).as("p"))
      else baskets.select(explode(expr(
        """flatten(transform(__items,
          |  (x, i) -> transform(slice(__items, i + 2, size(__items)),
          |            y -> struct(x AS u, y AS v))))""".stripMargin)).as("p"))
    pairs
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Per-vertex triangle counts on an undirected graph, exact. Input:
    * distinct edges (u, v) with u < v; output (vertex, n_tri) counting
    * the triangles each vertex corners.
    *
    * The join is DEGREE-ORDERED (each edge re-oriented from its lower
    * (deg, id) endpoint to its higher): out-degrees are then bounded by
    * O(sqrt(E)), which turns the worst-case path-join blowup of a
    * skewed hub vertex (deg d contributes d² paths) into the standard
    * O(E^1.5) triangle bound — the one orientation under which a
    * power-law graph is countable at all. Each triangle materializes
    * exactly once (orientation is acyclic), then fans out to its three
    * corners for the per-vertex count. The oriented edge list is
    * localCheckpoint'd: it feeds three join sides, and Spark re-runs a
    * self-join's lineage per side.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v"))
    val d = e0.select(col("u").as("k")).unionAll(e0.select(col("v").as("k")))
      .groupBy("k").agg(count(lit(1)).as("deg"))
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val e = e0
      .join(d.select(col("k").as("u"), col("deg").as("du")), "u")
      .join(d.select(col("k").as("v"), col("deg").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint(true)
    val tri = e.as("p1")
      .join(e.as("p2"), col("p2.s") === col("p1.t"))
      .join(e.as("p3"),
        col("p3.s") === col("p1.s") && col("p3.t") === col("p2.t"))
      .select(col("p1.s").as("a"), col("p1.t").as("b"), col("p2.t").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_tri"))
  }

  /** Link prediction by neighbor-set Jaccard: for every UNLINKED vertex
    * pair with at least one common neighbor, |N(a)∩N(c)| /
    * |N(a)∪N(c)| — the classic similarity-based candidate scorer.
    * Input: distinct edges (u, v) with u < v. Output (a, c, cn, jaccard)
    * with a < c.
    *
    * Scale shape: common neighbors come from the 2-path equi-join
    * (und ⋈ und on the middle vertex) — work is Σ deg(b)², bounded by
    * the same support-threshold sparsification the edge builders apply,
    * never corpus²; linked pairs leave via a left-anti join; degrees
    * attach by two metadata-scale joins. The undirected list is
    * localCheckpoint'd once (three consumers — the self-join re-run
    * rule). The single division makes the score bit-identical on any
    * engine (exact BIGINT counts in, one IEEE op out).
    */
  def jaccardLinks(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v"))
    val und = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val paths = und.as("x").join(und.as("y"), col("x.v") === col("y.u"))
      .where(col("x.u") < col("y.v"))
      .select(col("x.u").as("a"), col("y.v").as("c"))
    val cn = paths.groupBy("a", "c").agg(count(lit(1)).as("cn"))
    cn.join(e0.select(col("u").as("a"), col("v").as("c")),
        Seq("a", "c"), "left_anti")
      .join(deg.select(col("u").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("u").as("c"), col("deg").as("dc")), "c")
      .select(col("a"), col("c"), col("cn"),
        (col("cn").cast("double") / (col("da") + col("dc") - col("cn")))
          .as("jaccard"))
  }

  /** Link prediction by the resource-allocation index (Zhou/Lü/Zhang
    * 2009): for every UNLINKED pair with a common neighbor,
    * RA(a,c) = Σ_{b ∈ N(a)∩N(c)} 1/deg(b) — like Adamic-Adar but with a
    * raw (not log) degree penalty, which is what makes an EXACT integer
    * lane possible: each midpoint contributes `10⁹ div deg(b)` and the
    * per-pair score is a BIGINT sum — no `ln`, no float summation order,
    * bit-identical on any engine. Input: distinct edges (u, v) with
    * u < v. Output (a, c, cn, ra_ppb) with a < c; ra_ppb is the score in
    * parts-per-billion of a unit midpoint contribution.
    *
    * Scale shape: identical to [[jaccardLinks]] — the 2-path equi-join
    * keeps its midpoint, the midpoint's degree attaches BEFORE the
    * per-pair aggregation (one extra metadata-scale join against the
    * degree table), linked pairs leave via left-anti. Work is Σ deg(b)²
    * under the callers' support sparsification, never corpus².
    */
  def resourceAllocationLinks(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("u"), col("v"))
    val und = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val paths = und.as("x").join(und.as("y"), col("x.v") === col("y.u"))
      .where(col("x.u") < col("y.v"))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
    val scored = paths
      .join(deg.select(col("u").as("b"), col("deg").as("db")), "b")
      .groupBy("a", "c")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000000L div db")).as("ra_ppb"))
    scored.join(e0.select(col("u").as("a"), col("v").as("c")),
        Seq("a", "c"), "left_anti")
      .select(col("a"), col("c"), col("cn"), col("ra_ppb"))
  }

  /** Multi-source BFS hop distances on an undirected graph, depth-bounded.
    * Input: distinct edges (u, v); seeds (v). Output (v, dist) for every
    * vertex reachable within `maxHops` (seeds at dist 0, first-discovery
    * hop = shortest-path hop count — exact integers, so the result is
    * engine- and partitioning-independent with no fixed-point tricks).
    *
    * Scale shape: frontier expansion — each round equi-joins ONLY the
    * current frontier (not the visited set) against the edge list, then
    * anti-joins the visited set; per-round work is O(frontier-adjacent
    * edges), rounds are bounded by `maxHops`, and the undirected edge
    * list is localCheckpoint'd once (it feeds every round — the
    * iterative self-join re-run rule). The per-round driver emptiness
    * probe is a count on the (small) frontier, not a collect of it.
    */
  /** Fixed-round k-core peeling profile on an undirected graph. Each
    * round drops every vertex whose CURRENT degree is below `k` along
    * with its incident edges; after enough rounds the survivor set is
    * exactly the k-core. The round count is FIXED (not
    * run-until-fixpoint) so the result is a deterministic function of
    * the input that any engine reproduces by unrolling the same rounds —
    * a round past convergence simply removes nothing, which the profile
    * makes visible. Input: distinct edges (u, v) with u < v. Output one
    * row per round: (round, n_active, n_removed, n_edges_left), where
    * n_active counts vertices with ≥1 edge entering the round.
    *
    * Scale shape: per round one degree hash-agg plus two semi-joins on
    * the vertex key — O(E) per round with a fixed round bound, the
    * textbook distributed peeling step. The edge list is
    * localCheckpoint'd every round (it feeds the degree agg, both
    * semi-joins, and the next round — the iterative self-join re-run
    * rule), so lineage stays flat across rounds. Counts aggregate
    * distributed; nothing collects to the driver.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("u"), col("v")).localCheckpoint(true)
    var profile: DataFrame = null
    var r = 1
    while (r <= rounds) {
      val deg = e.select(col("u").as("vtx"))
        .unionAll(e.select(col("v").as("vtx")))
        .groupBy("vtx").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val keep = deg.where(col("deg") >= k).select("vtx")
      val e2 = e
        .join(keep.withColumnRenamed("vtx", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("vtx", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      // coalesce: a fully-peeled (empty) graph must report 0, not the
      // NULL that sum() returns over zero rows
      val row = deg.agg(count(lit(1)).as("n_active"),
          coalesce(sum(when(col("deg") < k, 1L).otherwise(0L)), lit(0L))
            .as("n_removed"))
        .crossJoin(e2.agg(count(lit(1)).as("n_edges_left")))
        .select(lit(r.toLong).as("round"), col("n_active"),
          col("n_removed"), col("n_edges_left"))
      profile = if (profile == null) row else profile.unionAll(row)
      e = e2
      r += 1
    }
    profile
  }

  /** Personalized PageRank: the [[pageRank]] integer-exact power
    * iteration with the teleport vector concentrated on a SEED set
    * instead of uniform — the standard "relevance to these nodes"
    * variant (seed-biased random walk with restart). Same BIGINT
    * floor-division discipline, so the DuckDB oracle replays every
    * round bit-for-bit:
    *
    *   r0(v)   = scale div |S|          if v ∈ S else 0
    *   base(v) = (r0(v) * (dampDen - dampNum)) div dampDen
    *   r'(v)   = base(v) + (dampNum * sum(contrib into v)) div dampDen
    *
    * Dangling leakage and overflow bounds are [[pageRank]]'s. Scale
    * shape is identical — one rank-to-edge equi-join + one hash agg per
    * round over a checkpointed edge frame; the seed set rides as a
    * broadcast semi-join, never a driver loop.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
        col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy("src").agg(sum("w").as("out_w"))
    val ew = e.join(outW, "src").localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val sd = seeds.select(col("v")).distinct()
    // seed flag materialized on the vertex frame once; |S| is a driver
    // literal so per-round arithmetic stays a pure column expression
    val vflag = verts.join(sd.withColumn("__s", lit(1)), Seq("v"), "left")
      .select(col("v"), coalesce(col("__s"), lit(0)).as("is_seed"))
      .localCheckpoint(true)
    val nSeeds = vflag.agg(sum("is_seed")).head().getLong(0)
    require(nSeeds > 0, "personalizedPageRank needs >=1 seed in the graph")
    val r0 = scale / nSeeds
    val base = r0 * (dampDen - dampNum) / dampDen
    var ranks = vflag.select(col("v"),
      (col("is_seed").cast("long") * lit(r0)).as("rank"))
    for (_ <- 1 to iters) {
      val inflow = ew.join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"),
          expr("(rank * w) div out_w").as("contrib"))
        .groupBy("v").agg(sum("contrib").as("inflow"))
      ranks = vflag.join(inflow, Seq("v"), "left")
        .select(col("v"),
          (col("is_seed").cast("long") * lit(base) +
            expr(s"($dampNum * coalesce(inflow, 0L)) div $dampDen"))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  def bfsDistances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val und = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var visited = seeds.select(col("v")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = visited.select("v")
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = und.join(frontier.withColumnRenamed("v", "u"), "u")
        .select(col("v")).distinct()
        .join(visited.select("v"), Seq("v"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint(true)
      visited = visited.unionAll(next).localCheckpoint(true)
      frontier = next.select("v")
      hop += 1
    }
    visited
  }

  /** Landmark closeness centrality: label-carrying multi-source BFS —
    * state rows are (v, landmark, dist), so ONE frontier expansion per
    * hop serves EVERY landmark (per-landmark BFS loops would be
    * O(|L|) driver-scheduled jobs; this is the composite-key form that
    * stays |L|-independent in job count). After `maxHops` rounds each
    * vertex aggregates its per-landmark hop distances into the standard
    * landmark estimate: n_reached + sum(dist) + the harmonic sum (in
    * exact permille — BIGINT `1000 div dist`, integer-exact on both
    * engines; the true-closeness ratio needs a float so the HARMONIC
    * integer lane is the cross-engine one). Landmarks report themselves
    * at dist 0 (excluded from the harmonic sum's 1/d terms). State is
    * bounded by V × |L|; per hop one equi-join + one distinct — the
    * [[bfsDistances]] shape with the landmark label along for the ride.
    */
  def landmarkCloseness(edges: DataFrame, landmarks: DataFrame,
      maxHops: Int): DataFrame = {
    val und = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var visited = landmarks.select(col("v")).distinct()
      .withColumn("lm", col("v"))
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = visited.select(col("v"), col("lm"))
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = und.join(frontier.withColumnRenamed("v", "u"), "u")
        .select(col("v"), col("lm")).distinct()
        .join(visited.select("v", "lm"), Seq("v", "lm"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .localCheckpoint(true)
      visited = visited.unionAll(next).localCheckpoint(true)
      frontier = next.select(col("v"), col("lm"))
      hop += 1
    }
    visited.groupBy("v")
      .agg(count(lit(1)).as("n_reached"),
        sum("dist").as("sum_dist"),
        sum(when(col("dist") > 0, expr("1000L div dist"))
          .otherwise(lit(0L))).as("harmonic_pm"),
        // landmark eccentricity: the farthest landmark seen within the
        // hop cap — the diameter-ish signal closeness sums hide
        max("dist").as("ecc_hops"))
  }

  /** Landmark betweenness centrality — truncated Brandes (Brandes &
    * Pich's source-sampled estimator) in EXACT integer arithmetic:
    * from each landmark, a label-carrying level-synchronous BFS
    * accumulates shortest-path counts σ (integer sums over the parent
    * frontier), then dependencies fold backward level by level in
    * fixed-point ppm with floor division ONLY —
    *
    *   δ(v) = Σ_{(v,w) tree edge} (σ(v) · (scale + δ(w))) div σ(w)
    *
    * — so the DuckDB oracle replays every level bit-for-bit (float δ
    * would diverge by summation order). BC(v) = Σ_s δ_s(v) over v≠s.
    * Truncation at `depth` bounds both state (V × |L| rows) and the
    * unrolled oracle; the deepest level's δ is 0 by construction.
    * Overflow bound: σ · (scale + δ) must sit under 2⁶³ — δ ≤ scale ·
    * reachable-set size, fine for ppm scale on graphs up to ~10⁹/σ
    * vertices per component.
    *
    * Scale shape: one equi-join + one hash agg per level in each
    * direction (2·depth joins total), job count independent of |L|
    * (the landmark label rides in the composite key); every level
    * frame localCheckpoints (iterative-lineage rule). Input: (u, v)
    * one row per undirected edge; sources: (v). Output: (v, bc_ppm)
    * for every vertex reached at depth ≥ 1 (zero rows kept — absence
    * means "never on a sampled shortest path").
    */
  def betweenness(edges: DataFrame, sources: DataFrame, depth: Int,
      scale: Long = 1000000L): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    val und = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    // forward: levels.head is the deepest; each frame (s, v, sigma)
    var levels = List(sources.select(col("v")).distinct()
      .withColumn("s", col("v"))
      .select(col("s"), col("v"), lit(1L).as("sigma"))
      .localCheckpoint(true))
    var visited = levels.head.select("s", "v").localCheckpoint(true)
    for (_ <- 1 to depth) {
      val next = und.join(levels.head.withColumnRenamed("v", "u")
          .withColumnRenamed("s", "ss"), "u")
        .groupBy(col("ss").as("s"), col("v"))
        .agg(sum("sigma").as("sigma"))
        .join(visited, Seq("s", "v"), "left_anti")
        .localCheckpoint(true)
      levels = next :: levels
      visited = visited.unionAll(next.select("s", "v")).localCheckpoint(true)
    }
    // backward: deepest level's delta is 0; each shallower level folds
    // its tree-children's (scale + delta) through the sigma ratio
    var lower = levels.head
      .select(col("s"), col("v"), col("sigma"), lit(0L).as("delta_fp"))
      .localCheckpoint(true)
    var out = lower.select("s", "v", "delta_fp")
    for (lv <- levels.tail) {
      val kids = lower.select(col("s").as("ks"), col("v").as("kv"),
        col("sigma").as("sigw"), col("delta_fp").as("dw"))
      val contrib = und.join(kids, col("v") === col("kv"))
        .select(col("ks").as("s"), col("u").as("v"),
          col("sigw"), col("dw"))
      val d = lv.join(contrib, Seq("s", "v"))
        .select(col("s"), col("v"),
          expr(s"(sigma * ($scale + dw)) div sigw").as("c"))
        .groupBy("s", "v").agg(sum("c").as("dsum"))
      lower = lv.join(d, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("sigma"),
          coalesce(col("dsum"), lit(0L)).as("delta_fp"))
        .localCheckpoint(true)
      out = out.unionAll(lower.select("s", "v", "delta_fp"))
    }
    out.where(col("v") =!= col("s"))
      .groupBy("v").agg(sum("delta_fp").as("bc_ppm"))
  }

  /** Deterministic hash-walks — the derandomized random-walk corpus
    * generator (DeepWalk/node2vec's sampling step): from every start
    * vertex, `steps` hops where hop `i` moves to the neighbor
    * minimizing (md5-hash(start:i:neighbor), neighbor) — a fixed
    * pseudo-random choice any engine reproduces (the 15-hex-char md5 →
    * signed-BIGINT lane; the step index in the key decorrelates
    * successive hops, so walks don't ping-pong 2-cycles). Walks are
    * NOT self-avoiding (matching the sampled-walk semantics). Output:
    * (start, step, node), step 0 = the start itself; a walk ends early
    * only at an isolated vertex.
    *
    * Scale shape: per hop ONE frontier-to-edges equi-join + one
    * per-start min election (struct min ≡ ORDER BY (h, v) — the packed
    * election discipline), state one row per start; job count
    * independent of |starts|.
    */
  def hashWalks(edges: DataFrame, starts: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val und = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var cur = starts.select(col("v").as("start")).distinct()
      .withColumn("node", col("start"))
    var out = cur.withColumn("step", lit(0))
    for (i <- 1 to steps) {
      val cand = und.join(cur.withColumnRenamed("node", "u"), "u")
        .withColumn("h", expr(
          "CAST(conv(substring(md5(concat(CAST(start AS STRING), " +
            s"':$i:', CAST(v AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      cur = cand.groupBy("start")
        .agg(min(struct(col("h"), col("v"))).as("m"))
        .select(col("start"), col("m.v").as("node"))
        .localCheckpoint(true)
      out = out.unionAll(cur.withColumn("step", lit(i)))
    }
    out.select("start", "step", "node")
  }

  /** Fixed-round weighted single-source shortest paths: `rounds` rounds
    * of Bellman–Ford relaxation over an undirected integer-weighted edge
    * list. Each round relaxes EVERY settled vertex (one equi-join + one
    * min agg, O(E) per round — never a path enumeration, which explodes
    * combinatorially on dense graphs), so after r rounds the distances
    * are exactly the r-hop-bounded shortest paths — a deterministic
    * integer function of the edge set, unrollable as SQL CTEs for the
    * oracle (the same fixed-round contract as [[labelPropagation]] /
    * kcore). Integer weights keep the min() election exact; lineage is
    * checkpointed per round (iterative rule). Unreached vertices are
    * absent. Input: (u, v, w) with one row per undirected edge; seeds:
    * (v) at distance 0. Output: (v, dist).
    */
  def ssspDistances(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val und = edges.select(col("u"), col("v"), col("w"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .localCheckpoint(true)
    var dist = seeds.select(col("v")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = und
        .join(dist.select(col("v").as("u"), col("dist").as("du")), "u")
        .select(col("v"), (col("du") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("v").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007) over an undirected edge list, run for `rounds` FIXED rounds:
    * every vertex starts labeled with its own id; each round it adopts
    * the most frequent label among its neighbors, ties to the smallest
    * label. Fixed rounds + the packed (count, label) BIGINT election key
    * make the result a deterministic integer function of the edge set —
    * unrollable as SQL CTEs for the oracle — where run-to-convergence
    * LPA oscillates order-dependently. Requires vertex ids < 10⁹ (the
    * pack reserves 9 digits for the label; co-purchase part keys are
    * ≤10⁶ at every SF). Per round: one neighbor-label equi-join + two
    * keyed aggs — O(E) with no per-vertex loop; lineage is checkpointed
    * per round (iterative rule). Returns (vtx, label).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    // both directions in ONE pass over the edge subtree — a Union of two
    // selects would plan (and run) an expensive uncheckpointed edge
    // build twice (the graph_degree_dist lesson)
    val und = edges.select(explode(array(
        struct(col("u").as("vtx"), col("v").as("nbr")),
        struct(col("v").as("vtx"), col("u").as("nbr")))).as("p"))
      .select(col("p.vtx").as("vtx"), col("p.nbr").as("nbr"))
      .localCheckpoint(true)
    var labels = und.select(col("vtx")).distinct()
      .withColumn("label", col("vtx").cast("long")).localCheckpoint(true)
    for (_ <- 0 until rounds) {
      labels = und
        .join(labels.select(col("vtx").as("nbr"), col("label")), "nbr")
        .groupBy("vtx", "label").agg(count(lit(1)).as("cnt"))
        // (count desc, label asc) election as ONE max over a packed key:
        // 9 label digits under the count — exact cross-engine, no
        // arg_max struct ordering needed (the DuckDB invariant)
        .withColumn("pack",
          col("cnt") * 1000000000L + (lit(999999999L) - col("label")))
        .groupBy("vtx").agg(max("pack").as("p"))
        .select(col("vtx"),
          (lit(999999999L) - col("p") % 1000000000L).as("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
