package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the standard
  * corpus-curation steps that need it: variance auditing ("how many
  * effective dimensions does this embedding space have"), whitening, and
  * cheap 2-D visualisation coordinates for a corpus map.
  *
  * Architecture (the only PCA shape that survives 100 TB): the d×d
  * covariance is derived from the EXACT fixed-point sufficient statistics
  * (Σ q qᵀ upper triangle, Σ q, n with q = floor(x·2¹⁶)) computed by the
  * one-pass mergeable `graft_gram_multi` aggregate — the shuffle moves
  * one ~17 KB buffer per partition, never rows. The d×d eigensolve then
  * happens DRIVER-SIDE (metadata scale, like IVF centroids), and the
  * projection is a shuffle-free map over the corpus. Nothing iterates
  * over the data; adding 1000× rows changes only the scan.
  *
  * Determinism: the sufficient statistics are integer sums (associative,
  * engine-independent); the eigensolve is a fixed-order cyclic Jacobi
  * with a deterministic sweep schedule and a sign convention (largest-
  * magnitude component positive, lowest index on ties), so repeated runs
  * and any partitioning give bit-identical components.
  */
object Pca {

  /** Fixed-point scale shared with [[graft.functions.GramAgg]]. */
  val Scale = 65536.0

  /** The exact Gram-statistics gate view: one row per upper-triangle cell
    * (i ≤ j, 0-based) of Σ floor(x_i·2¹⁶)·floor(x_j·2¹⁶) over the corpus,
    * plus the row count — integer-exact, so an independent engine can
    * recompute it cell-for-cell.
    */
  def gramUpper(emb: DataFrame, vecCol: String, dims: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val tri = dims * (dims + 1) / 2
    val g = emb
      .agg(expr(s"graft_gram_multi($vecCol, 0, $dims, 1)").as("__g"))
      .select(slice(col("__g"), 1, tri).as("__t"),
        element_at(col("__g"), tri + dims + 1).as("n"))
      .select(posexplode(col("__t")).as(Seq("__idx", "gram_fp")), col("n"))
    // invert the row-major upper-triangle layout: cell t of row i starts
    // at i·d − i(i−1)/2; recover (i, j) arithmetically so the mapping is
    // engine-reproducible (no driver lookup table)
    g.withColumn("i",
        floor(lit(dims.toDouble + 0.5) -
          sqrt(lit((dims.toDouble + 0.5) * (dims.toDouble + 0.5)) -
            lit(2.0) * col("__idx"))).cast("long"))
      .withColumn("j",
        (col("__idx") - col("i") * dims + col("i") * (col("i") - 1) / 2 +
          col("i")).cast("long"))
      .select(col("i"), col("j"), col("gram_fp"), col("n"))
  }

  /** Top-k principal components of the COVARIANCE of `vecCol`, solved
    * driver-side from the exact one-pass statistics. Returns
    * (eigenvalues desc, components[k][d], means[d]).
    */
  def fit(emb: DataFrame, vecCol: String, dims: Int,
      k: Int): (Array[Double], Array[Array[Double]], Array[Double]) = {
    require(k >= 1 && k <= dims, "k must be in [1, dims]")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val tri = dims * (dims + 1) / 2
    val buf = emb
      .agg(expr(s"graft_gram_multi($vecCol, 0, $dims, 1)").as("g"))
      .head().getSeq[Long](0).toArray
    val n = buf(tri + dims).toDouble
    require(n > 0, "pca needs a non-empty corpus")
    val mean = Array.tabulate(dims)(i => buf(tri + i) / (Scale * n))
    // covariance C = E[xxᵀ] − μμᵀ from the exact integer sums
    val cov = Array.ofDim[Double](dims, dims)
    var idx = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val e2 = buf(idx) / (Scale * Scale * n)
        val c = e2 - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        idx += 1
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(e => (-evals(e), e)).take(k)
    val comps = order.map { e =>
      val v = Array.tabulate(dims)(r => evecs(r)(e))
      // sign convention: largest-|component| positive, lowest index wins
      var best = 0
      var m = 0.0
      var r = 0
      while (r < dims) {
        if (math.abs(v(r)) > m) { m = math.abs(v(r)); best = r }
        r += 1
      }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    (order.map(evals).toArray, comps, mean)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic sweep order (row-major upper triangle), fixed
    * convergence threshold. Returns (eigenvalues, eigenvector columns).
    */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → t = 1
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project the corpus onto the top-k components: (idCol, pc1..pck),
    * rounded 6 (the per-row dot is the one float-order-fixed step; the
    * components themselves are deterministic). Shuffle-free projection —
    * the fitted model rides along as literals.
    */
  def project(emb: DataFrame, vecCol: String, idCol: String, dims: Int,
      k: Int): DataFrame = {
    val (_, comps, mean) = fit(emb, vecCol, dims, k)
    projectWith(emb, vecCol, idCol, comps, mean)
  }

  /** [[project]] with an already-fitted model riding along as literals —
    * lets a caller capture (comps, mean) for an external recompute (the
    * gate splices them into the DuckDB oracle) while projecting with the
    * exact same expressions.
    */
  def projectWith(emb: DataFrame, vecCol: String, idCol: String,
      comps: Array[Array[Double]], mean: Array[Double]): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedLit(mean.toSeq), (x, m) => x - m)
    val cols = comps.zipWithIndex.map { case (w, i) =>
      round(call_function("graft_dot", col("__c"), typedLit(w.toSeq)), 6)
        .as(s"pc${i + 1}")
    }
    emb.withColumn("__c", centered)
      .select(col(idCol) +: cols.toIndexedSeq: _*)
  }
}
