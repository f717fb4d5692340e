package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.DatapointStore

/** Time-travel table: [[Mutations]]' bucket-granular copy-on-write plus a
  * transaction log, so every historical snapshot stays readable — the
  * lakehouse property a training-data pipeline needs for reproducibility
  * ("train exactly on the corpus as of version N") and for auditable
  * takedowns.
  *
  * Layout:
  * {{{
  *   root/_log/<%020d>.json      one commit record per version
  *   root/_log/_horizon          oldest version still readable (vacuum)
  *   root/data/v=N/<partCol>=B/  bucket files WRITTEN BY commit N
  * }}}
  *
  * A commit record lists the buckets its version rewrote (`buckets`) and
  * the buckets it deleted entirely (`dropped`). A snapshot at version V
  * resolves, per bucket, the latest commit <= V that mentions it — so
  * unchanged buckets are SHARED across versions (no duplication), and a
  * merge's I/O is O(affected buckets), never O(table).
  *
  * Crash safety is commit-record-last: data files are written first, the
  * record is renamed into `_log/` atomically afterwards. A crash anywhere
  * leaves either a fully-committed version or an orphaned `data/v=N` dir
  * that no record references — readers never see it and [[heal]] removes
  * it before the next write reuses the version number. Single-writer by
  * design (the store's driver owns the log), matching the reference's
  * one-owner stream-store model — and GUARDED: two writers racing the
  * same version number resolve by commit-record CAS (atomic create-new);
  * the loser raises [[graft.model.ConcurrentCommit]] instead of silently
  * last-wins-overwriting the winner's record, and its orphaned data dir
  * is healed by the next writer.
  *
  * At 100 TB: the log is metadata (one tiny JSON per commit, resolved
  * driver-side); reads list O(buckets) directories and prune to the
  * buckets a query names; [[vacuum]] bounds storage by dropping bucket
  * dirs no retained snapshot references, in O(dirs) metadata work.
  */
object VersionedTable {

  /** `dv` (r15) lists the buckets this version's DELETION VECTOR masks —
    * a merge-on-read delete writes only the deleted KEYS under
    * `root/dv/v=N/<partCol>=b` and rewrites nothing; the data dirs are
    * untouched (`buckets`/`dropped` empty). Old records parse with
    * `dv = Nil`. */
  final case class Commit(version: Long, buckets: Seq[Long],
      dropped: Seq[Long], dv: Seq[Long] = Nil)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private def fsOf(root: String): FileSystem = DatapointStore.fsFor(root)

  private def logDir(root: String) = new Path(s"$root/_log")

  private def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** All committed versions, ascending. An EMPTY record file is skipped:
    * on a non-local FS a create-new commit record's content becomes
    * visible at close, so a racing reader may glimpse a zero-length file
    * — an in-flight commit, read-committed semantics (the local-FS lane
    * hard-links full content atomically and never hits this).
    */
  def commits(root: String): Seq[Commit] = {
    val fs = fsOf(root)
    val dir = logDir(root)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir)
      // dot-prefixed = a local-lane .tmp-N.json staging file (a crash
      // between link and tmp-delete would otherwise read as a DUPLICATE
      // commit record — the hidden-name filter every interpreting
      // listing needs); zero-length = an in-flight non-local record
      .filter(f => f.getPath.getName.endsWith(".json") &&
        !f.getPath.getName.startsWith(".") && f.getLen > 0)
      .sortBy(_.getPath.getName).toSeq
      .map { f =>
        val n = mapper.readTree(readString(fs, f.getPath))
        def longs(field: String): Seq[Long] =
          if (!n.has(field)) Seq.empty
          else {
            val arr = n.get(field)
            (0 until arr.size()).map(arr.get(_).asLong())
          }
        Commit(n.get("version").asLong(), longs("buckets"),
          longs("dropped"), longs("dv"))
      }
  }

  def latestVersion(root: String): Long =
    commits(root).lastOption.map(_.version).getOrElse(-1L)

  /** Oldest version [[readAt]] may still serve (advanced by [[vacuum]]). */
  def horizon(root: String): Long = {
    val fs = fsOf(root)
    val f = new Path(logDir(root), "_horizon")
    if (fs.exists(f)) readString(fs, f).trim.toLong else 0L
  }

  /** Remove data dirs no commit record references (a crashed writer's
    * leftovers — invisible to readers, but their version number is about
    * to be reused), plus STALE commit-record debris in the log itself:
    * a non-local writer crashing between `create(overwrite=false)` and
    * `close` leaves a permanent zero-length record — readers skip it,
    * but every future [[writeCommit]] for that version hits the
    * existence CAS and raises ConcurrentCommit, wedging the table with
    * no retry that can ever succeed. Zero-length records (and orphaned
    * local-lane `.tmp-*.json` staging files) older than `graceMs` are
    * deleted here — the grace window keeps a genuinely in-flight
    * foreign commit's record alive through its write.
    *
    * CLOCK-SYNC ASSUMPTION (r15): the age test compares the record's FS
    * modification time (the writer's clock on most object stores) to
    * THIS process's clock — a reader whose clock runs more than
    * `graceMs` ahead of a foreign writer's can sweep that writer's
    * in-flight record and silently void the create-new commit CAS
    * (duplicate commit of the version). The default grace is therefore
    * 15 min — orders of magnitude above NTP-class skew AND above any
    * real record write (a one-block JSON put), at the cost of a wedged
    * table staying wedged for that long after a true crash. Multi-writer
    * deployments without synchronized clocks should pass
    * `graceMs = Long.MaxValue` (opt out of the record sweep entirely)
    * and clear crashed records operationally.
    */
  def heal(root: String, graceMs: Long = 900000L): Unit = {
    val fs = fsOf(root)
    val log = logDir(root)
    if (fs.exists(log)) {
      val cutoff = System.currentTimeMillis() - graceMs
      fs.listStatus(log)
        .filter(f => f.getPath.getName.endsWith(".json") &&
          f.getModificationTime < cutoff &&
          (f.getLen == 0 || f.getPath.getName.startsWith(".")))
        .foreach(f => fs.delete(f.getPath, false))
    }
    val committed = commits(root).map(_.version).toSet
    val data = new Path(s"$root/data")
    if (fs.exists(data)) fs.listStatus(data).map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filterNot(d => committed(d.getName.drop(2).toLong))
      .foreach(DatapointStore.rmTree(fs, _))
    // same data-first rule for deletion-vector sidecars: a crashed
    // merge-on-read delete leaves an orphan dv/v=N no record references
    val dv = new Path(s"$root/dv")
    if (fs.exists(dv)) fs.listStatus(dv).map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filterNot(d => committed(d.getName.drop(2).toLong))
      .foreach(DatapointStore.rmTree(fs, _))
  }

  /** Publish a commit record via compare-and-swap: the content is staged
    * to a tmp file, then hard-LINKED to the final name — link creation is
    * atomic create-new on POSIX, so if another writer already committed
    * this version number the link fails and we raise [[graft.model
    * .ConcurrentCommit]] instead of silently last-wins-overwriting their
    * record (rename() would replace). The loser's orphaned `data/v=N` dir
    * is invisible to readers (no record references it) and the next
    * writer's [[heal]] removes it — the table stays readable throughout.
    */
  private[graft] def writeCommit(root: String, c: Commit): Unit = {
    val fs = fsOf(root)
    fs.mkdirs(logDir(root))
    val json = s"""{"version":${c.version},""" +
      s""""buckets":[${c.buckets.mkString(",")}],""" +
      s""""dropped":[${c.dropped.mkString(",")}],""" +
      s""""dv":[${c.dv.mkString(",")}]}"""
    val name = f"${c.version}%020d.json"
    if (fs.getUri.getScheme == "file") {
      // local FS: hard-link create-new is the POSIX-atomic CAS with the
      // FULL content already durable (the IndexGen dual-path discipline)
      val dir = logDir(root).toUri.getPath
      val tmp = java.nio.file.Paths.get(dir, s".tmp-${c.version}.json")
      java.nio.file.Files.writeString(tmp, json)
      try java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dir, name), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
          throw graft.model.ConcurrentCommit(root, c.version)
      }
      java.nio.file.Files.delete(tmp)
    } else {
      // non-local: create(overwrite = false) is the namenode-atomic CAS
      // on EXISTENCE; content lands at close (commits() skips the
      // zero-length window — read-committed)
      val out =
        try fs.create(new Path(logDir(root), name), false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            throw graft.model.ConcurrentCommit(root, c.version)
          case _: java.io.IOException =>
            throw graft.model.ConcurrentCommit(root, c.version)
        }
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private def bucketsWritten(root: String, v: Long, partCol: String): Seq[Long] = {
    val fs = fsOf(root)
    val d = new Path(s"$root/data/v=$v")
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(_.drop(partCol.length + 1).toLong).sorted.toSeq
  }

  /** Create version 0 from `df`. `partExpr` must be a LONG-typed pure
    * function of the key columns (the same premise as
    * [[Mutations.mergeIntoPartitioned]]).
    */
  def init(spark: SparkSession, root: String, df: DataFrame,
      partExpr: Column, partCol: String = "bucket"): Long = {
    require(latestVersion(root) < 0, s"versioned table already exists: $root")
    heal(root)
    df.withColumn(partCol, partExpr).repartition(col(partCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(s"$root/data/v=0")
    writeCommit(root, Commit(0L, bucketsWritten(root, 0L, partCol), Seq.empty))
    0L
  }

  /** Per-bucket leaf dir of the snapshot at `version` (latest commit
    * <= version wins per bucket; a bucket whose winning commit dropped it
    * is absent).
    */
  private def snapshotDirs(root: String, version: Long,
      partCol: String): Seq[(Long, String)] = {
    val upTo = commits(root).filter(_.version <= version)
    require(upTo.nonEmpty, s"no commit at or before version $version in $root")
    val latest = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    upTo.foreach { c =>
      c.buckets.foreach(b => latest(b) = (c.version, true))
      c.dropped.foreach(b => latest(b) = (c.version, false))
    }
    latest.toSeq.collect { case (b, (v, true)) =>
      b -> s"$root/data/v=$v/$partCol=$b"
    }.sortBy(_._1)
  }

  /** Deletion-vector dirs ACTIVE at snapshot `v`: a DV written by commit
    * W masks bucket b iff the bucket's winning data version at the
    * snapshot predates it — `V_b < W <= v`. A later rewrite of b (merge /
    * [[compactDeletes]]) folds the mask into data (its base read is
    * DV-aware), so `V_b >= W` retires the DV for that bucket
    * automatically; time-travel BELOW W never sees it. `partExpr` being a
    * pure function of the key columns means a key lives in exactly one
    * bucket, so the dir-level rule needs no per-row version bookkeeping.
    */
  private def activeDvDirs(root: String, v: Long, partCol: String,
      bucketFilter: Long => Boolean = _ => true): Seq[String] = {
    val upTo = commits(root).filter(_.version <= v)
    val winning = scala.collection.mutable.Map[Long, Long]()
    upTo.foreach { c =>
      c.buckets.foreach(b => winning(b) = c.version)
      c.dropped.foreach(b => winning.remove(b))
    }
    val fs = fsOf(root)
    upTo.flatMap { c =>
      c.dv.collect {
        case b if bucketFilter(b) &&
            winning.get(b).exists(_ < c.version) =>
          s"$root/dv/v=${c.version}/$partCol=$b"
      }
    }.filter(d => fs.exists(new Path(d)))
  }

  /** Snapshot read with deletion-vector masking, restricted to buckets
    * passing `bucketFilter` — the one reader [[readAt]], [[merge]] and
    * [[changes]] all resolve through.
    */
  private def maskedRead(spark: SparkSession, root: String,
      payloadSchema: StructType, v: Long, partCol: String,
      bucketFilter: Long => Boolean = _ => true): DataFrame = {
    val vfs = fsOf(root)
    val dirs = snapshotDirs(root, v, partCol)
      .collect { case (b, d) if bucketFilter(b) => d }
      .filter(d => vfs.exists(new Path(d)))
    val df =
      if (dirs.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          payloadSchema)
      else spark.read.schema(payloadSchema).parquet(dirs: _*)
    val dvDirs = activeDvDirs(root, v, partCol, bucketFilter)
    if (dvDirs.isEmpty) df
    else {
      // DV files hold exactly the key columns — the anti-join keys ARE
      // the DV schema, so the reader needs no keyCols parameter
      val dv = spark.read.parquet(dvDirs: _*)
      df.join(dv, dv.columns.toSeq, "left_anti")
    }
  }

  /** Read the table as of `version` (-1 = latest). Payload schema is
    * pinned so an empty snapshot is an empty frame, never an inference
    * failure. Merge-on-read deletes apply here as a key anti-join against
    * the active deletion vectors (metadata-scale: only DV dirs whose
    * bucket hasn't been rewritten since).
    */
  def readAt(spark: SparkSession, root: String, payloadSchema: StructType,
      version: Long = -1L, partCol: String = "bucket"): DataFrame = {
    val v = if (version < 0) latestVersion(root) else version
    require(v >= horizon(root),
      s"version $v vacuumed (horizon ${horizon(root)}) in $root")
    maskedRead(spark, root, payloadSchema, v, partCol)
  }

  /** MERGE-ON-READ delete (r15): commit a new version that removes
    * `keys` (a frame of exactly the key columns) WITHOUT rewriting any
    * bucket — at 100 TB a compliance-delete of 100 rows must not COW
    * whole buckets. The deleted keys land as a deletion-vector sidecar
    * under `root/dv/v=N/<partCol>=b` (data-first, commit-record-last:
    * a crash before the record leaves an orphan dv dir that [[heal]]
    * removes); readers anti-join the active DVs, and the next rewrite of
    * a bucket (a [[merge]] touching it, or [[compactDeletes]] past a
    * threshold) folds the mask into data and retires the DV. Same
    * concurrency discipline as [[merge]]: the commit-record CAS detects
    * a foreign racer; [[mergeWithRetry]]-style looping belongs to the
    * caller (deletes are idempotent — re-masking the same keys is a
    * no-op at read time). NOTE the staging contract is also [[merge]]'s
    * verbatim: `dv/v=N` is staged (Overwrite) BEFORE the commit CAS, so
    * two FOREIGN writers racing the same version are out of contract —
    * a CAS loser's stage write could overwrite the winner's committed
    * DV content. One writer process per table; the CAS is the safety
    * net that turns a violation into ConcurrentCommit, not a license
    * for concurrent same-version retries.
    */
  def deleteMergeOnRead(spark: SparkSession, root: String, keys: DataFrame,
      partExpr: Column, partCol: String = "bucket"): Long = {
    heal(root)
    val prev = latestVersion(root)
    require(prev >= 0, s"init() the table before deleting: $root")
    val v = prev + 1
    val ch = keys.withColumn(partCol, partExpr).localCheckpoint(true)
    val affected = ch.select(partCol).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (affected.isEmpty) return prev
    ch.repartition(col(partCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(s"$root/dv/v=$v")
    commitInterceptor.foreach(_(v))
    writeCommit(root, Commit(v, Seq.empty, Seq.empty, affected))
    v
  }

  /** Fold accumulated deletion vectors back into data — the
    * read-amplification bound for the merge-on-read lane: every bucket
    * carrying at least `minDvPerBucket` active DVs is COW-rewritten from
    * its masked content (one staged job for all hot buckets), retiring
    * those DVs for all snapshots >= the new version. Time-travel below
    * it still resolves the old dirs + DVs; [[vacuum]] reclaims both past
    * the horizon.
    */
  def compactDeletes(spark: SparkSession, root: String,
      payloadSchema: StructType, partExpr: Column,
      minDvPerBucket: Int = 2, partCol: String = "bucket"): Long = {
    heal(root)
    val prev = latestVersion(root)
    require(prev >= 0, s"init() the table before compacting: $root")
    val perBucket = activeDvDirs(root, prev, partCol)
      .map(_.split('/').last.drop(partCol.length + 1).toLong)
      .groupBy(identity).view.mapValues(_.size)
    val hot = perBucket.collect {
      case (b, n) if n >= minDvPerBucket => b }.toSeq.sorted
    if (hot.isEmpty) return prev
    val v = prev + 1
    val hotSet = hot.toSet
    maskedRead(spark, root, payloadSchema, prev, partCol, hotSet)
      .withColumn(partCol, partExpr)
      .repartition(col(partCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(s"$root/data/v=$v")
    val written = bucketsWritten(root, v, partCol)
    // a fully-masked bucket writes nothing — it retires via `dropped`
    val dropped = hot.filterNot(written.contains)
    commitInterceptor.foreach(_(v))
    writeCommit(root, Commit(v, written, dropped))
    v
  }

  /** Apply a changelog (op 'U'/'D' + version column, the
    * [[Mutations.mergeFrame]] contract) as a NEW table version: only the
    * changelog-named buckets are read from the current snapshot, merged
    * and rewritten under `data/v=N`; every other bucket is inherited by
    * the log. Returns the committed version.
    */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
      keyCols: Seq[String], partExpr: Column, partCol: String = "bucket",
      opCol: String = "op", versionCol: String = "version"): Long = {
    heal(root)
    val prev = latestVersion(root)
    require(prev >= 0, s"init() the table before merging: $root")
    val v = prev + 1
    val ch = changes.withColumn(partCol, partExpr).localCheckpoint(true)
    val affected = ch.select(partCol).distinct()
      .collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return prev
    val payloadSchema = StructType(
      changes.schema.filterNot(f => f.name == opCol || f.name == versionCol))
    val affectedSet = affected.toSet
    // DV-aware base (r15): a bucket rewrite FOLDS its active deletion
    // vectors — the base must already be masked or a merge would
    // resurrect merge-on-read-deleted rows
    val base = maskedRead(spark, root, payloadSchema, prev, partCol,
      affectedSet)
    Mutations.mergeFrame(base, ch.drop(partCol), keyCols, opCol, versionCol)
      .withColumn(partCol, partExpr)
      .repartition(col(partCol)).sortWithinPartitions(keyCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(s"$root/data/v=$v")
    val written = bucketsWritten(root, v, partCol)
    val dropped = affected.filterNot(written.contains).toSeq
    commitInterceptor.foreach(_(v))
    writeCommit(root, Commit(v, written, dropped))
    v
  }

  /** Test seam: runs right before [[merge]]'s commit record lands, so a
    * spec can deterministically interleave a "foreign" writer into the
    * CAS window. Never set outside tests.
    */
  private[graft] var commitInterceptor: Option[Long => Unit] = None

  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(new Path(root).toString, _ => new Object)

  /** [[merge]] with optimistic-retry semantics — the loop callers need
    * now that the commit CAS DETECTS a race: on [[graft.model
    * .ConcurrentCommit]], re-read HEAD, re-validate the changelog
    * against the winner's snapshot (merge() recomputes its base from
    * the new latest version — last-write-wins re-derives against the
    * winner's data, serializable-append), and re-attempt under a
    * bounded retry budget.
    *
    * Concurrency model, honestly stated: writers WITHIN this driver
    * serialize on a per-root lock (the engine's one-owner store model —
    * concurrent Spark jobs in one driver are the realistic writers), so
    * in-process contenders never even trip the CAS. The CAS + retry
    * handles a FOREIGN process racing the log; its commit record is
    * guaranteed present when ConcurrentCommit raises, so the retry's
    * re-read sees its snapshot. Foreign writers racing the DATA staging
    * window remain out of contract (single writing driver per table),
    * as documented on the object.
    */
  def mergeWithRetry(spark: SparkSession, root: String, changes: DataFrame,
      keyCols: Seq[String], partExpr: Column, partCol: String = "bucket",
      opCol: String = "op", versionCol: String = "version",
      maxRetries: Int = 5): Long = {
    val lock = lockFor(root)
    var attempt = 0
    while (true) {
      lock.synchronized {
        try return merge(spark, root, changes, keyCols, partExpr, partCol,
          opCol, versionCol)
        catch {
          case e: graft.model.ConcurrentCommit =>
            if (attempt >= maxRetries) throw e
        }
      }
      attempt += 1
    }
    -1L // unreachable
  }

  /** Change-data-capture between two committed snapshots: one row per
    * key whose payload differs, tagged 'I' (only in `to`), 'D' (only in
    * `from`) or 'U' (present in both, payload changed). The diff reads
    * ONLY buckets some commit in (from, to] rewrote or dropped — the log
    * names them — so consuming a day of versions on a 100 TB table scans
    * the day's churn, not the table. Output: key columns + change_op +
    * each payload column as before_<c>/after_<c>.
    */
  def changes(spark: SparkSession, root: String, payloadSchema: StructType,
      keyCols: Seq[String], fromVersion: Long, toVersion: Long,
      partCol: String = "bucket"): DataFrame = {
    require(fromVersion <= toVersion, s"$fromVersion > $toVersion")
    val touched = commits(root)
      .filter(c => c.version > fromVersion && c.version <= toVersion)
      // a merge-on-read delete changes rows without writing buckets —
      // its dv list names the buckets whose rows it masked
      .flatMap(c => c.buckets ++ c.dropped ++ c.dv).toSet
    val payload = payloadSchema.fieldNames.filterNot(keyCols.contains).toSeq
    def side(v: Long, tag: String): DataFrame = {
      val df = maskedRead(spark, root, payloadSchema, v, partCol, touched)
      df.select(keyCols.map(col) ++
        (lit(true).as(s"_in_$tag") +:
          payload.map(p => col(p).as(s"${tag}_$p"))): _*)
    }
    side(fromVersion, "before").join(side(toVersion, "after"), keyCols, "full_outer")
      .withColumn("change_op",
        when(col("_in_before").isNull, "I")
          .when(col("_in_after").isNull, "D")
          .otherwise("U"))
      // null-safe payload compare: a null column value must not make a
      // genuinely-changed row vanish from the feed
      .where(col("change_op") =!= "U" ||
        !(struct(payload.map(p => col(s"before_$p")): _*) <=>
          struct(payload.map(p => col(s"after_$p")): _*)))
      .drop("_in_before", "_in_after")
  }

  /** Keep the last `keep` versions readable; drop every bucket dir only
    * older snapshots reference and advance the horizon. Metadata-only
    * work: the log names every candidate dir.
    */
  def vacuum(root: String, keep: Int, partCol: String = "bucket"): Int = {
    val all = commits(root)
    if (all.length <= keep) return 0
    val newHorizon = all(all.length - keep).version
    val live = (all.length - keep until all.length)
      .flatMap(i => snapshotDirs(root, all(i).version, partCol))
      .map(_._2).toSet
    // compare on ROOT-RELATIVE names: Hadoop listing paths carry a
    // scheme ("file:/..."), the snapshot-constructed strings do not
    val liveRel = live.map(d => d.split('/').takeRight(2).mkString("/"))
    var removed = 0
    val fs = fsOf(root)
    val data = new Path(s"$root/data")
    if (fs.exists(data)) fs.listStatus(data).map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(_.getName.drop(2).toLong < newHorizon)
      .foreach { vd =>
        fs.listStatus(vd).map(_.getPath)
          .filter(_.getName.startsWith(s"$partCol=")).foreach { bd =>
            if (!liveRel(s"${vd.getName}/${bd.getName}")) {
              DatapointStore.rmTree(fs, bd); removed += 1
            }
          }
      }
    // deletion vectors: dv/v=W/bucket=b is dead once no retained
    // snapshot needs it — for W < horizon that is exactly "the bucket
    // was rewritten (or dropped) at some X in (W, horizon]", i.e. its
    // winning version AT the horizon is >= W (V_b is monotone, so later
    // snapshots can only retire it further). W >= horizon stays: it is
    // part of retained history.
    val winningAtHorizon = scala.collection.mutable.Map[Long, Long]()
    all.filter(_.version <= newHorizon).foreach { c =>
      c.buckets.foreach(b => winningAtHorizon(b) = c.version)
      c.dropped.foreach(b => winningAtHorizon.remove(b))
    }
    val dvRoot = new Path(s"$root/dv")
    if (fs.exists(dvRoot)) fs.listStatus(dvRoot).map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(_.getName.drop(2).toLong < newHorizon)
      .foreach { vd =>
        val w = vd.getName.drop(2).toLong
        fs.listStatus(vd).map(_.getPath)
          .filter(_.getName.startsWith(s"$partCol=")).foreach { bd =>
            val b = bd.getName.drop(partCol.length + 1).toLong
            if (!winningAtHorizon.get(b).exists(_ < w)) {
              DatapointStore.rmTree(fs, bd); removed += 1
            }
          }
        // only write debris left (_SUCCESS, .crc) ⇒ the version dir is done
        if (!fs.listStatus(vd).exists(
            _.getPath.getName.startsWith(s"$partCol=")))
          DatapointStore.rmTree(fs, vd)
      }
    writeString(fs, new Path(logDir(root), "_horizon"), newHorizon.toString)
    removed
  }
}
