package graft

import org.apache.spark.sql.functions._

/** Phase-level timing of the store_pipeline query (append + ladder + read
  * back) — a profiling aid for the bench hot spot, not part of the driver
  * contract. Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfileStore
  */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    // listener events arrive via an async bus: wait for the counters to go
    // quiet before snapshotting, or a phase's trailing task-end events get
    // credited to the next phase (task counts are the metric that matters
    // here — wall seconds have ±2-3x machine variance)
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
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (j1, k1) = drained()
      println(f"[profile] $name%-22s $dt%8.2f s" +
        f"  jobs=${j1 - j0}%3d tasks=${k1 - k0}%5d")
      r
    }
    val work = java.nio.file.Files.createTempDirectory("graft-store-prof").toString
    val ds = new graft.core.Datastream(s, work)
    val ev = SparkEntry.events(s, dir).where(col("user_id") < 5)
    val idOf = phase("ensure (keys+streams)") {
      val keys = ev.select("user_id", "event_type").distinct().collect()
      keys.map { r =>
        val (u, et) = (r.getLong(0).toString, r.getString(1))
        s"$u:$et" -> ds.ensureStream(Map("user" -> u, "type" -> et))
      }.toMap
    }
    val uuidOf = typedLit(idOf)
    phase("appendMultiple") {
      ds.appendMultiple(ev.select(
        uuidOf(concat_ws(":", col("user_id"), col("event_type"))).as("stream_id"),
        col("ts").as("t"), col("value").as("v")), checkTimestamp = false)
    }
    phase("downsampleStreams") {
      ds.downsampleStreams(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    }
    phase("read-back days") {
      ds.datapoints.where(col("granularity") === "days")
        .join(ds.streams.select(col("stream_id"), col("tags")), "stream_id")
        .count()
    }
    s.stop()
  }
}
