package graft

import org.apache.spark.sql.functions._

/** Job-level breakdown of the drv_counter_derivative_stream_skewed gate
  * fixture (the suite's heaviest bench row): per-phase jobs/tasks/CPU,
  * grouped by the streaming engine's per-micro-batch job descriptions —
  * a profiling aid, not part of the driver contract. Usage:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileSkew"
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    // experiment knob: GRAFT_ROCKS_CHANGELOG=1 flips RocksDB changelog
    // checkpointing on for the whole session (per-commit delta upload
    // instead of SST snapshot) to measure its share of the per-batch cost
    if (sys.env.get("GRAFT_ROCKS_CHANGELOG").contains("1"))
      s.conf.set("spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled", "true")
    import s.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    // stageId -> job description, so task CPU can be charged per site
    val stageDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    case class Agg(var jobs: Int, var tasks: Int, var cpuNs: Long)
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Agg]()
    def siteOf(desc: String): String = {
      // streaming micro-batch jobs carry "... batch = N" descriptions;
      // collapse the id-bearing prefix so batches group as "batch N"
      val i = desc.indexOf("batch = ")
      if (i >= 0) "uBatch " + desc.substring(i + 8).takeWhile(_.isDigit)
      else if (desc.length > 70) desc.take(70) else desc
    }
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        val site = siteOf(desc)
        j.stageIds.foreach(id => stageDesc.put(id, site))
        sites.computeIfAbsent(site, _ => Agg(0, 0, 0L)).jobs += 1
        ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        val c = if (m != null) m.executorCpuTime else 0L
        cpuNs.addAndGet(c)
        val site = stageDesc.getOrDefault(t.stageId, "?")
        val a = sites.computeIfAbsent(site, _ => Agg(0, 0, 0L))
        a.tasks += 1; a.cpuNs += c
        ()
      }
    })
    def drained(): (Int, Int, Long) = {
      var prev = (jobs.get(), tasks.get(), cpuNs.get())
      var stable = 0
      while (stable < 3) {
        Thread.sleep(50)
        val cur = (jobs.get(), tasks.get(), cpuNs.get())
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      prev
    }
    def phase[A](name: String)(f: => A): A = {
      val (j0, k0, c0) = drained()
      sites.clear()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (j1, k1, c1) = drained()
      println(f"[profile] $name%-24s $dt%7.2f s  jobs=${j1 - j0}%3d" +
        f" tasks=${k1 - k0}%5d cpu=${(c1 - c0) / 1e9}%7.2f s")
      import scala.jdk.CollectionConverters._
      sites.asScala.toSeq.sortBy(-_._2.cpuNs).take(12).foreach { case (k, a) =>
        println(f"            j=${a.jobs}%3d t=${a.tasks}%5d" +
          f" cpu=${a.cpuNs / 1e9}%7.2f  $k")
      }
      r
    }

    // === the drv_counter_derivative_stream_skewed fixture, phase-split ===
    implicit val ctx = s.sqlContext
    val memS = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Streaming.Point]
    val memR = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Streaming.ResetEvent]
    val name = "cdrst_prof"
    val sentinelKey = "zzz_wm_sentinel"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val mode = if (args.nonEmpty) args(0) else "split"
      val q = phase("query start") {
        val fold =
          if (mode == "unified")
            graft.streaming.Streaming.counterDerivativeWithResetsSkewed(
              memS.toDS(), memR.toDS(), "300 seconds", Some(1000.0))
          else
            graft.streaming.Streaming.counterDerivativeWithResets(
              graft.streaming.Streaming.reorderBuffer(
                memS.toDS(), "300 seconds"),
              graft.streaming.Streaming.reorderBufferResets(
                memR.toDS(), "300 seconds"),
              Some(1000.0))
        fold.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
      }
      try {
        val (srcRows, rstRows, maxT) = phase("fixture build") {
          val ctr = {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("stream_id").orderBy("t")
            SparkEntry.events(s, dir).select(
                concat_ws(":", col("user_id"), col("event_type")).as("stream_id"),
                timestamp_seconds(unix_timestamp(col("ts"))).as("t"),
                col("value").as("v"))
              .groupBy("stream_id", "t").agg(sum("v").as("v"))
              .withColumn("v", sum(col("v")).over(w) % 1000.0)
          }.localCheckpoint(true)
          val rnd = new scala.util.Random(13)
          def jitter(tMs: Long) = tMs + (rnd.nextInt(181) - 90) * 1000L
          val sr = ctr.orderBy("t", "stream_id").collect()
            .map(r => graft.streaming.Streaming.Point(
              r.getString(0), r.getTimestamp(1), r.getDouble(2)))
            .map(p => (p, jitter(p.t.getTime)))
            .sortBy { case (p, jt) => (jt, p.stream_id, p.t.getTime) }
            .map(_._1)
          val rr = ctr
            .where(floor(col("v")).cast("long") % 10 === 3)
            .select("stream_id", "t").orderBy("t", "stream_id").collect()
            .map(r => graft.streaming.Streaming.ResetEvent(
              r.getString(0), r.getTimestamp(1)))
            .map(p => (p, jitter(p.t.getTime)))
            .sortBy { case (p, jt) => (jt, p.stream_id, p.t.getTime) }
            .map(_._1)
          (sr, rr, sr.map(_.t.getTime).max)
        }
        println(s"[profile] ${srcRows.length} src rows, ${rstRows.length} resets, mode=$mode")
        val sCut = srcRows.grouped(srcRows.length / 3 + 1).toSeq
        val rCut = rstRows.grouped(rstRows.length / 3 + 1).toSeq
        (0 until 3).foreach { i =>
          phase(s"replay batch $i") {
            if (i < rCut.length) memR.addData(rCut(i).toSeq)
            if (i < sCut.length) memS.addData(sCut(i).toSeq)
            q.processAllAvailable()
          }
        }
        Seq(3600000L, 7200000L).zipWithIndex.foreach { case (off, i) =>
          phase(s"sentinel $i") {
            memS.addData(Seq(graft.streaming.Streaming.Point(sentinelKey,
              new java.sql.Timestamp(maxT + off), 0.0)))
            memR.addData(Seq(graft.streaming.Streaming.ResetEvent(sentinelKey,
              new java.sql.Timestamp(maxT + off))))
            q.processAllAvailable()
          }
        }
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val n = phase("read sink")(
      s.table(name).where(col("stream_id") =!= sentinelKey).count())
    println(s"[profile] output rows: $n")
    s.stop()
  }
}
