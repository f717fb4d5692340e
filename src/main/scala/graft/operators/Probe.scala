package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear probing over embedding columns — the "train a cheap classifier
  * on frozen embeddings" step of a curation pipeline (quality filters,
  * domain classifiers, SemDeDup-style probes are all linear heads).
  *
  * The distributed part is ONE exact sufficient-statistics pass
  * ([[graft.functions.GramAgg]]): G = Σ qqᵀ and b = Σ qy in fixed-point
  * BIGINT, map-side combined, one 17 KB buffer per partition shuffled.
  * The dims×dims ridge solve is driver-side by design — it is metadata-
  * scale (64×64), while the data pass never leaves the executors. This
  * is the classic two-tier shape of distributed linear models (Spark
  * MLlib's normal-equation solver has the same skeleton).
  */
object Probe {

  /** The sufficient statistics as oracle-checkable rows (idx, val):
    * upper-triangle G, then b, then n — see [[graft.functions.GramAgg]]
    * for the layout. `target` must be an integer 0/1 column expression.
    */
  def gramStats(df: DataFrame, embCol: String, target: Column,
      dims: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(embCol).as("__e"), target.cast("long").as("__y"))
      .agg(expr(s"graft_gram_agg(__e, __y, $dims)").as("g"))
      .select(posexplode(col("g")).as(Seq("idx", "val")))
      .select(col("idx").cast("long").as("idx"), col("val"))
  }

  /** Ridge regression weights from one stats pass: solve
    * (G/s² + λI) w = b/s on the driver (s = 2^16 de-quantization).
    * Features are augmented with a constant 1 (0/1 targets need the
    * bias to calibrate scores around the 0.5 threshold), so the result
    * has dims+1 entries — the last is the intercept, and the intercept
    * row is not regularized.
    */
  def linearProbe(df: DataFrame, embCol: String, target: Column,
      dims: Int, lambda: Double = 1e-3): Array[Double] = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val d1 = dims + 1
    val row = df
      .select(
        expr(s"concat(CAST($embCol AS ARRAY<DOUBLE>), array(1.0D))").as("__e"),
        target.cast("long").as("__y"))
      .agg(expr(s"graft_gram_agg(__e, __y, $d1)").as("g"))
      .head().getSeq[Long](0).toArray
    val tri = d1 * (d1 + 1) / 2
    val s = 65536.0
    val a = Array.ofDim[Double](d1, d1)
    var idx = 0
    for (i <- 0 until d1; j <- i until d1) {
      val v = row(idx) / (s * s); a(i)(j) = v; a(j)(i) = v; idx += 1
    }
    for (i <- 0 until dims) a(i)(i) += lambda
    val b = Array.tabulate(d1)(i => row(tri + i) / s)
    solve(a, b)
  }

  /** In-place Gaussian elimination with partial pivoting — dims×dims,
    * driver-side, no deps. */
  private[graft] def solve(a: Array[Array[Double]],
      b: Array[Double]): Array[Double] = {
    val n = b.length
    for (c <- 0 until n) {
      var p = c
      for (r <- c + 1 until n) if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      val tb = b(c); b(c) = b(p); b(p) = tb
      val piv = a(c)(c)
      for (r <- c + 1 until n) {
        val f = a(r)(c) / piv
        if (f != 0.0) {
          for (k <- c until n) a(r)(k) -= f * a(c)(k)
          b(r) -= f * b(c)
        }
      }
    }
    val w = new Array[Double](n)
    for (c <- n - 1 to 0 by -1) {
      var acc = b(c)
      for (k <- c + 1 until n) acc -= a(c)(k) * w(k)
      w(c) = acc / a(c)(c)
    }
    w
  }

  /** One-vs-rest heads for ALL classes from ONE data pass
    * ([[graft.functions.MultiGramAgg]]): the Gram matrix is shared
    * across heads — only the right-hand sides differ — so training C
    * classifiers costs one scan + C driver-side dims×dims solves, not C
    * scans. Returns one (dims+1)-long weight vector per class (last =
    * intercept), ≡ calling [[linearProbe]] per class.
    */
  def multiProbe(df: DataFrame, embCol: String, clsCol: Column,
      dims: Int, nClasses: Int,
      lambda: Double = 1e-3): Array[Array[Double]] = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val d1 = dims + 1
    val row = df
      .select(
        expr(s"concat(CAST($embCol AS ARRAY<DOUBLE>), array(1.0D))").as("__e"),
        clsCol.cast("long").as("__c"))
      .agg(expr(s"graft_gram_multi(__e, __c, $d1, $nClasses)").as("g"))
      .head().getSeq[Long](0).toArray
    val tri = d1 * (d1 + 1) / 2
    val s = 65536.0
    val a0 = Array.ofDim[Double](d1, d1)
    var idx = 0
    for (i <- 0 until d1; j <- i until d1) {
      val v = row(idx) / (s * s); a0(i)(j) = v; a0(j)(i) = v; idx += 1
    }
    for (i <- 0 until dims) a0(i)(i) += lambda
    Array.tabulate(nClasses) { c =>
      val b = Array.tabulate(d1)(i => row(tri + c * d1 + i) / s)
      solve(a0.map(_.clone()), b)
    }
  }

  /** Argmax-head classification with [[multiProbe]] weights: adds
    * `pred_class` (ties break to the LOWEST class index — the
    * array_position-of-max rule every gate argmax uses).
    */
  def scoreMulti(df: DataFrame, heads: Array[Array[Double]],
      embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val scores = heads.map { w =>
      call_function("graft_dot",
        col(embCol).cast("array<double>"),
        array(w.init.map(lit).toSeq: _*)) + lit(w.last)
    }
    df.withColumn("__s", array(scores.toSeq: _*))
      .withColumn("pred_class",
        (expr("array_position(__s, array_max(__s))") - 1L).cast("long"))
      .drop("__s")
  }

  /** Score rows with [[linearProbe]] weights: adds `score` = x·w + bias
    * via the codegen dot kernel (weights broadcast as a literal array —
    * no join). `w` is the (dims+1)-long probe output, last = intercept.
    */
  def score(df: DataFrame, w: Array[Double], embCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__w", array(w.init.map(lit).toSeq: _*))
      .withColumn("score",
        expr(s"graft_dot(CAST($embCol AS ARRAY<DOUBLE>), __w)") + lit(w.last))
      .drop("__w")
  }
}
