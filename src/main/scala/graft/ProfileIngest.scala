package graft

import org.apache.spark.sql.functions._

/** Job-level breakdown of one streaming-ingest micro-batch (the
  * store_stream_ingest bench hot spot): which store phase spawns how many
  * jobs/tasks, with per-callsite job counts — a profiling aid, not part
  * of the driver contract. Usage: SPARK_GRAFT_SF_DIR=... runMain
  * graft.ProfileIngest
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        sites.merge(site, 1, (a, b) => a + b)
        ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    def drained(): (Int, Int) = {
      var prev = (jobs.get(), tasks.get())
      var stable = 0
      while (stable < 3) {
        Thread.sleep(50)
        val cur = (jobs.get(), tasks.get())
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      prev
    }
    def phase[A](name: String)(f: => A): A = {
      val (j0, k0) = drained()
      sites.clear()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (j1, k1) = drained()
      println(f"[profile] $name%-26s $dt%8.2f s" +
        f"  jobs=${j1 - j0}%3d tasks=${k1 - k0}%5d")
      import scala.jdk.CollectionConverters._
      sites.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (k, v) =>
        println(f"            $v%3d x $k")
      }
      r
    }

    val work = java.nio.file.Files.createTempDirectory("graft-ingest-prof").toString
    val ds = new graft.core.Datastream(s, work)
    // same input as store_stream_ingest: "3:"-prefixed event streams,
    // same-second values summed
    val ev = SparkEntry.events(s, dir)
      .select(concat_ws(":", col("user_id"), col("event_type")).as("k"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("t"),
        col("value").as("v"))
      .where(col("k").startsWith("3:"))
      .groupBy("k", "t").agg(sum("v").as("v"))
    val rows = ev.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val keys = rows.map(_._1).distinct.sorted
    println(s"[profile] ${rows.length} rows, ${keys.length} source streams")
    val idOf = keys.map(k => k -> ds.ensureStream(Map("src" -> k))).toMap
    keys.foreach(k => ds.ensureStream(Map("drv" -> k),
      deriveFrom = Seq(idOf(k)), deriveOp = Some(graft.model.DeriveOps.Derivative)))
    val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val uuidOf = typedLit(idOf)
    def mk(rs: Seq[(String, java.sql.Timestamp, Double)]) =
      rs.toDF("k", "t", "v")
        .select(uuidOf(col("k")).as("stream_id"), col("t"), col("v"))
    val b1 = mk(rows.filter(_._2.before(cut)).toSeq)
    val b2 = mk(rows.filterNot(_._2.before(cut)).toSeq)

    // batch 1: replicate Streaming.ingest's foreachBatch body phase by phase
    phase("b1 isEmpty")(b1.isEmpty)
    val r1 = phase("b1 appendMultiple")(
      ds.appendMultiple(b1, checkTimestamp = false, dedupExisting = true))
    phase("b1 downsampleStreams")(
      if (r1.written > 0) r1.maxT.foreach(hi => ds.downsampleStreams(hi)))
    // batch 2
    val r2 = phase("b2 appendMultiple")(
      ds.appendMultiple(b2, checkTimestamp = false, dedupExisting = true))
    phase("b2 downsampleStreams")(
      if (r2.written > 0) r2.maxT.foreach(hi => ds.downsampleStreams(hi)))
    // the gate query ingests with compactEvery=2: compaction runs after
    // the second batch, so the re-delivered batch reads a compacted store
    phase("b2 compactStore")(ds.compactStore())
    // batch 2 re-delivered (idempotent path): a zero-row write skips the
    // ladder entirely in Streaming.ingest
    val r3 = phase("b2r appendMultiple")(
      ds.appendMultiple(b2, checkTimestamp = false, dedupExisting = true))
    phase("b2r downsampleStreams")(
      if (r3.written > 0) r3.maxT.foreach(hi => ds.downsampleStreams(hi)))
    s.stop()
  }
}
