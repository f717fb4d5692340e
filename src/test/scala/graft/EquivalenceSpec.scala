package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.model.Granularity
import graft.operators.{Derive, Downsample}

/** Seeded-random equivalence properties over the Spark operators
  * (SURVEY §5.3): partial+final fold ≡ single pass, ladder composition,
  * derive ops vs a pure-Scala oracle. Integer-valued doubles keep float
  * sums exact so equality is bit-level.
  */
class EquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val base = 1704067200L // 2024-01-01 UTC

  def randomPoints(seed: Int, n: Int, spanSec: Long): Seq[(String, Timestamp, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (s"s${rnd.nextInt(3)}",
        new Timestamp((base + (rnd.nextLong().abs % spanSec)) * 1000L),
        rnd.nextInt(1000).toDouble)
    }
  }

  val aggCols = Seq("stream_id", "t", "c", "s", "q", "l", "u", "t_first", "t_last")

  test("fold from partials == direct aggregation, any ladder pair (5 seeds)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val df = randomPoints(seed, 300, 7L * 86400).toDF("stream_id", "t", "v")
      for ((fine, coarse) <- Seq(
          (Granularity.Minutes, Granularity.Hours),
          (Granularity.Seconds10, Granularity.Minutes10),
          (Granularity.Hours, Granularity.Days))) {
        val direct = Downsample.toGranularity(df, coarse)
          .select(aggCols.head, aggCols.tail: _*).collect().map(_.toSeq).toSet
        val folded = Downsample.foldToCoarser(
            Downsample.toGranularity(df, fine), coarse)
          .select(aggCols.head, aggCols.tail: _*).collect().map(_.toSeq).toSet
        assert(folded == direct, s"seed=$seed $fine->$coarse")
      }
    }
  }

  test("ladder composition: fold f->m->c == fold f->c (3 seeds)") {
    import spark.implicits._
    for (seed <- 10 to 12) {
      val df = randomPoints(seed, 300, 7L * 86400).toDF("stream_id", "t", "v")
      val fine = Downsample.toGranularity(df, Granularity.Minutes)
      val twoStep = Downsample.foldToCoarser(
          Downsample.foldToCoarser(fine, Granularity.Hours), Granularity.Days)
        .select(aggCols.head, aggCols.tail: _*).collect().map(_.toSeq).toSet
      val oneStep = Downsample.foldToCoarser(fine, Granularity.Days)
        .select(aggCols.head, aggCols.tail: _*).collect().map(_.toSeq).toSet
      assert(twoStep == oneStep, s"seed=$seed")
    }
  }

  test("derive ops match a pure-Scala oracle on random counters (5 seeds)") {
    import spark.implicits._
    for (seed <- 20 to 24) {
      val rnd = new scala.util.Random(seed)
      var ctr = 0.0
      val pts = (0 until 200).map { i =>
        ctr = (ctr + rnd.nextInt(50)) % 1000.0
        ("c0", new Timestamp((base + i * 10L + rnd.nextInt(5)) * 1000L), ctr)
      }.distinctBy(_._2).sortBy(_._2.getTime)
      val df = pts.toDF("stream_id", "t", "v")

      // pure-Scala oracles over the sorted sequence
      val pairs = pts.sliding(2).filter(_.size == 2).toSeq
      val oracleDeriv = pairs.collect { case Seq((_, t1, v1), (_, t2, v2))
          if t2.getTime != t1.getTime =>
        (t2, (v2 - v1) / ((t2.getTime - t1.getTime) / 1000L)) }
      val oracleResets = pairs.collect { case Seq((_, _, v1), (_, t2, v2))
          if v2 < v1 => (t2, 1.0) }
      val oracleCd = pairs.collect { case Seq((_, t1, v1), (_, t2, v2))
          if t2.getTime != t1.getTime =>
        val d = if (v2 >= v1) v2 - v1 else 1000.0 - v1 + v2
        (t2, d / ((t2.getTime - t1.getTime) / 1000L)) }

      def got(r: org.apache.spark.sql.DataFrame) = r.orderBy("t").collect()
        .map(x => (x.getTimestamp(1), x.getDouble(2))).toSeq
      assert(got(Derive.derivative(df)) == oracleDeriv, s"seed=$seed derivative")
      assert(got(Derive.counterReset(df)) == oracleResets, s"seed=$seed reset")
      assert(got(Derive.counterDerivative(df, Some(1000.0))) == oracleCd,
        s"seed=$seed counter_derivative")
    }
  }

  test("set-wise keyed derive variants == per-stream originals (5 seeds)") {
    // the wave-batched cascade routes MANY derived streams through ONE
    // call of these keyed variants; pin them bit-equal to the
    // single-stream operators they replace, including null max_value
    // (no-wrap semantics) and reset suppression
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val outs = Seq("o1", "o2", "o3")
      val series = outs.map { o =>
        o -> (0 until 60).map { i =>
          (o, new Timestamp((base + i * 37 + rnd.nextInt(5)) * 1000L),
            rnd.nextInt(256).toDouble)
        }
      }.toMap
      val maxOf: Map[String, Option[Double]] =
        Map("o1" -> Some(256.0), "o2" -> None, "o3" -> Some(1000.0))
      val resets = outs.map { o =>
        o -> (0 until 4).map(_ =>
          (o, new Timestamp((base + rnd.nextInt(60 * 37)) * 1000L)))
      }.toMap

      // V4: per-stream broadcast bounds vs literal-bound originals
      val allSrc = series.values.flatten.toSeq.toDF("stream_id", "t", "v")
      val allReset = resets.values.flatten.toSeq.toDF("stream_id", "t")
      val maxDf = outs.map(o =>
        (o, maxOf(o).map(Double.box).orNull.asInstanceOf[java.lang.Double]))
        .toDF("stream_id", "max_value")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet
      val batched = rows(Derive.counterDerivativePerStream(
        allSrc, maxDf, Some(allReset)))
      val single = outs.flatMap { o =>
        rows(Derive.counterDerivative(
          series(o).toDF("stream_id", "t", "v"), maxOf(o),
          Some(resets(o).toDF("stream_id", "t"))))
      }.toSet
      assert(batched == single, s"seed $seed: V4 keyed != per-stream")

      // V1: keyed multi-granularity sum vs per-stream streamSum
      val gOf = Map("o1" -> Granularity.Seconds, "o2" -> Granularity.Minutes,
        "o3" -> Granularity.Hours)
      val tagged = allSrc.join(
        outs.map(o => (o, gOf(o).seconds)).toDF("stream_id", "gsec"),
        "stream_id")
      val sumBatched = rows(Derive.streamSumKeyed(tagged))
      val sumSingle = outs.flatMap { o =>
        rows(Derive.streamSum(
          series(o).toDF("stream_id", "t", "v"), gOf(o), o))
      }.toSet
      assert(sumBatched == sumSingle, s"seed $seed: V1 keyed != per-stream")
    }
  }

  test("ewma matches a pure-Scala sequential fold, bit-exact (5 seeds)") {
    import spark.implicits._
    for (seed <- 30 to 34) {
      val pts = randomPoints(seed, 250, 7L * 86400)
        .distinctBy(p => (p._1, p._2)) // ewma assumes a total per-stream order
      val df = pts.toDF("stream_id", "t", "v")
      val oracle = pts.groupBy(_._1).flatMap { case (sid, ps) =>
        var acc = 0.0; var first = true
        ps.sortBy(_._2.getTime).map { case (_, t, v) =>
          acc = if (first) { first = false; v } else 0.3 * v + 0.7 * acc
          (sid, t, acc)
        }
      }.toSet
      val got = Derive.ewma(df, alpha = 0.3).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet
      assert(got == oracle, s"seed=$seed")
    }
  }

  override def afterAll(): Unit = spark.stop()
}
