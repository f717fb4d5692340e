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
  * `_idx_lease_<gen>_<expiryMs>_<uuid>`, created by the writer BEFORE
  * its marker CAS (r14: lease-first ordering — a `begin` landing in the
  * old marker→lease window saw the new generation unleased and could
  * plan against mid-publication state; now the lease is visible before
  * the generation ever advances, and a CAS loser deletes its own lease)
  * and dropped by [[release]] after its last rename — and [[begin]]
  * raises ConcurrentCommit while an unexpired lease exists.
  * Second-writer safety is thus a mechanism, not a contract. A crashed
  * holder's lease expires after `ttlMs` (publication is seconds of
  * renames; the default gives 60 s of bounded unavailability after a
  * writer crash, never inconsistency — the interrupted state itself
  * heals on the next read); the TTL must exceed the longest real
  * publication, which callers doing unusually slow renames
  * (cross-bucket object-store copies) should raise.
  *
  * TTL expiry is FENCED (r14): [[advance]] returns the lease's exact
  * file name as a token, and staged lanes call [[checkLease]]
  * immediately before their publish renames — a holder stalled past the
  * TTL (GC pause, slow FS) whose lease a successor broke raises
  * ConcurrentCommit instead of continuing its renames over state the
  * successor now owns. Readers consult [[leaseHeld]] before
  * heal-on-read: a live writer's staged publication must not be
  * "repaired" away by a concurrent search (reader-vs-writer — the r13
  * residual).
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

  /** Expiry millis parsed from a lease file name (0 on malformed ⇒
    * treated expired). Handles both the r13 `<gen>_<expiry>` and the
    * r14 `<gen>_<expiry>_<uuid>` formats.
    */
  private def leaseExpiry(name: String): Long =
    name.stripPrefix(LeasePrefix).split('_') match {
      case arr if arr.length >= 2 =>
        try arr(1).toLong catch { case _: NumberFormatException => 0L }
      case _ => 0L
    }

  /** Read-only probe: does an UNEXPIRED publish lease exist? Readers
    * call this before heal-on-read — a live writer is mid-publication
    * and its staged state must be served around, not repaired away.
    * Expired leases are ignored (not broken — readers stay read-only on
    * the marker namespace; [[begin]] breaks them).
    */
  def leaseHeld(fs: FileSystem, root: String): Boolean = {
    val dir = new Path(root)
    if (!fs.exists(dir)) return false
    val now = System.currentTimeMillis()
    fs.listStatus(dir).exists { s =>
      val n = s.getPath.getName
      n.startsWith(LeasePrefix) && leaseExpiry(n) >= now
    }
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
        if (leaseExpiry(n) < now)
          fs.delete(p, false) // crashed holder: break it
        else throw graft.model.ConcurrentCommit(root, -1L)
      }
    }
    current(fs, root)
  }

  /** CAS-advance `seen` → `seen + 1` under the publish lease. Raises
    * ConcurrentCommit when another mutator already published that
    * generation. The lease is created BEFORE the marker CAS (so no
    * begin() can observe the advanced generation unleased); the loser
    * deletes its own lease before raising. Superseded markers are
    * pruned after a win (keep only the max — the applyIvfBatch horizon
    * discipline). Returns the lease token: the winner MUST call
    * [[release]] after its renames (a missed release self-heals at
    * lease expiry) and SHOULD [[checkLease]] the token immediately
    * before destructive renames.
    */
  def advance(fs: FileSystem, root: String, seen: Long,
      ttlMs: Long = 60000L): String = {
    fs.mkdirs(new Path(root))
    val leaseName = s"$LeasePrefix${seen + 1}_" +
      s"${System.currentTimeMillis() + ttlMs}_" +
      java.util.UUID.randomUUID().toString.take(8)
    fs.create(new Path(root, leaseName), true).close()
    // Stale-generation fence (r15): the marker CAS alone only detects ONE
    // intervening generation — superseded markers are pruned after a win,
    // so a writer stalled between begin and advance across TWO full
    // mutations would re-create the pruned `_idx_mut_(seen+1)` and "win"
    // over two-generations-newer state. Compare against the MAX marker
    // under our own lease (any racer past this point holds the marker CAS)
    // and refuse unless the root is still at the generation we observed.
    if (current(fs, root) != seen) {
      fs.delete(new Path(root, leaseName), false)
      throw graft.model.ConcurrentCommit(root, seen + 1)
    }
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
    if (!won) {
      fs.delete(new Path(root, leaseName), false) // loser's own lease
      throw graft.model.ConcurrentCommit(root, seen + 1)
    }
    fs.listStatus(new Path(root)).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(Prefix) && n.stripPrefix(Prefix).toLong < seen + 1)
        fs.delete(p, false)
    }
    leaseName
  }

  /** TTL fence: raise ConcurrentCommit unless this writer's lease file
    * (the token [[advance]] returned) still exists — a holder stalled
    * past the TTL was broken by a successor's [[begin]] and must NOT
    * continue its renames over state the successor now owns. Call
    * immediately before each staged lane's publish renames.
    */
  def checkLease(fs: FileSystem, root: String, token: String): Unit =
    if (!fs.exists(new Path(root, token)))
      throw graft.model.ConcurrentCommit(root, -1L)

  /** Drop EXACTLY this writer's publish lease (the token [[advance]]
    * returned) — call after the last rename of the publication section.
    * Token-precise on purpose (r15): a generation-prefix sweep would let
    * a late-waking former holder delete a DIFFERENT writer's lease for
    * the same numeric generation. Idempotent (an expired-and-broken
    * lease is simply gone).
    */
  def release(fs: FileSystem, root: String, token: String): Unit = {
    val p = new Path(root, token)
    if (fs.exists(p)) fs.delete(p, false)
  }
}
