package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Optimistic concurrency token for on-disk index roots (IVF cell trees,
  * BM25 postings/doclens) — the [[VersionedTable]] `writeCommit`
  * hard-link CAS ported to the index mutation lanes.
  *
  * Protocol: a mutation reads the root's generation with [[begin]] at
  * entry and calls [[advance]] at its PUBLISH point (after hidden
  * staging, before the first destructive rename). Two mutators that
  * both observed generation g race to create the `_idx_mut_(g+1)`
  * marker; creation is atomic (POSIX hard-link create-new on a local
  * FS, namenode-atomic `create(overwrite = false)` elsewhere), so
  * exactly one wins — the loser raises
  * [[graft.model.ConcurrentCommit]] with its stage output intact, and
  * the next heal-on-read sweeps that pre-publish state away. No live
  * state is ever touched by the loser.
  *
  * The CAS alone closes the LOST-UPDATE race (the r11 hazard: an append
  * racing a cell swap lands files in a retired dir) but not the
  * RENAME-WINDOW race: a mutation beginning INSIDE another's publish
  * window (the span of renames after its CAS) would plan against a
  * half-swapped state. [[advance]] therefore also takes a LEASE —
  * `_idx_lease_<gen>_<expiryMs>`, created by the CAS winner before its
  * first rename and dropped by [[release]] after its last — and
  * [[begin]] raises ConcurrentCommit while an unexpired lease exists.
  * Second-writer safety is thus a mechanism, not a contract (the r12
  * residual, closed). A crashed holder's lease expires after `ttlMs`
  * (publication is seconds of renames; the default gives 60 s of
  * bounded unavailability after a writer crash, never inconsistency —
  * the interrupted state itself heals on the next read); the TTL must
  * exceed the longest real publication, which callers doing unusually
  * slow renames (cross-bucket object-store copies) should raise.
  */
private[graft] object IndexGen {
  private val Prefix = "_idx_mut_"
  private val LeasePrefix = "_idx_lease_"

  /** Max published generation marker under `root`; 0 when none. */
  def current(fs: FileSystem, root: String): Long = {
    val dir = new Path(root)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith(Prefix) =>
        n.stripPrefix(Prefix).toLong }
      .foldLeft(0L)(math.max)
  }

  /** Mutation entry point: the observed generation, guarded by the
    * rename-window lease — raises ConcurrentCommit while another
    * writer's unexpired lease is on the root (it is mid-publication;
    * nothing this mutation plans against is stable). Expired leases
    * (crashed holders) are broken here.
    */
  def begin(fs: FileSystem, root: String): Long = {
    val dir = new Path(root)
    if (!fs.exists(dir)) return 0L
    val now = System.currentTimeMillis()
    fs.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(LeasePrefix)) {
        val expiry = n.stripPrefix(LeasePrefix).split('_') match {
          case Array(_, e) => try e.toLong catch {
            case _: NumberFormatException => 0L }
          case _ => 0L
        }
        if (expiry < now) fs.delete(p, false) // crashed holder: break it
        else throw graft.model.ConcurrentCommit(root, -1L)
      }
    }
    current(fs, root)
  }

  /** CAS-advance `seen` → `seen + 1` and take the publish lease. Raises
    * ConcurrentCommit when another mutator already published that
    * generation. Superseded markers are pruned after a win (keep only
    * the max — the applyIvfBatch horizon discipline). The winner MUST
    * call [[release]] after its renames; a missed release self-heals at
    * lease expiry.
    */
  def advance(fs: FileSystem, root: String, seen: Long,
      ttlMs: Long = 60000L): Unit = {
    fs.mkdirs(new Path(root))
    val name = s"$Prefix${seen + 1}"
    val won =
      if (fs.getUri.getScheme == "file") {
        // local FS: hard-link create-new is the POSIX-atomic CAS
        // (rename would last-wins-overwrite; create(false) checks then
        // creates non-atomically on RawLocalFileSystem)
        val dir = new Path(root).toUri.getPath
        val tmp = java.nio.file.Paths.get(dir,
          s".$name.tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.writeString(tmp, "")
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dir, name), tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally java.nio.file.Files.deleteIfExists(tmp)
      } else {
        try { fs.create(new Path(root, name), false).close(); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      }
    if (!won) throw graft.model.ConcurrentCommit(root, seen + 1)
    // lease BEFORE the caller's first rename: begin() holds every other
    // writer out of the rename window until release (or expiry)
    fs.create(new Path(root,
      s"$LeasePrefix${seen + 1}_${System.currentTimeMillis() + ttlMs}"),
      true).close()
    fs.listStatus(new Path(root)).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(Prefix) && n.stripPrefix(Prefix).toLong < seen + 1)
        fs.delete(p, false)
    }
  }

  /** Drop this writer's publish lease — call after the last rename of
    * the publication section. Idempotent (an expired-and-broken lease
    * is simply gone).
    */
  def release(fs: FileSystem, root: String, gen: Long): Unit = {
    val dir = new Path(root)
    if (!fs.exists(dir)) return
    fs.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(LeasePrefix) &&
          n.stripPrefix(LeasePrefix).startsWith(s"${gen}_"))
        fs.delete(p, false)
    }
  }
}
