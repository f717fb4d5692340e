package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Optimistic concurrency token for on-disk index roots (IVF cell trees,
  * BM25 postings/doclens) — the [[VersionedTable]] `writeCommit`
  * hard-link CAS ported to the index mutation lanes.
  *
  * Protocol: a mutation reads the root's generation with [[current]] at
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
  * Scope: this closes the LOST-UPDATE race — overlapping mutations that
  * both planned against the same observed state can no longer both
  * publish (the r11 hazard: an append racing a cell swap lands files in
  * a retired dir). A mutation that begins INSIDE another's publish
  * window (the sub-second span of renames after its CAS) still needs
  * external serialization; the streaming lanes provide it naturally by
  * mutating from one foreachBatch loop.
  */
private[graft] object IndexGen {
  private val Prefix = "_idx_mut_"

  /** Max published generation marker under `root`; 0 when none. */
  def current(fs: FileSystem, root: String): Long = {
    val dir = new Path(root)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith(Prefix) =>
        n.stripPrefix(Prefix).toLong }
      .foldLeft(0L)(math.max)
  }

  /** CAS-advance `seen` → `seen + 1`. Raises ConcurrentCommit when
    * another mutator already published that generation. Superseded
    * markers are pruned after a win (keep only the max — the
    * applyIvfBatch horizon discipline).
    */
  def advance(fs: FileSystem, root: String, seen: Long): Unit = {
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
    fs.listStatus(new Path(root)).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith(Prefix) && n.stripPrefix(Prefix).toLong < seen + 1)
        fs.delete(p, false)
    }
  }
}
