package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single-object commit primitive every [[Store]] mutation bottoms
  * out in — the seam between the generation/fence protocol (which is
  * filesystem-agnostic) and the one piece of it that is not: making
  * exactly ONE of N concurrent writers of the same metadata object
  * win, with losers failing loudly and readers never observing a
  * partial object.
  *
  * Contract an implementation must meet (the "StoreCommit contract"
  * spec in StoreMaintenanceSpec is the executable form; run any new
  * implementation against that block verbatim):
  *
  *  1. [[createExclusive]]: create an EMPTY, name-only exclusion token
  *     at `p`. Returns true iff this call created it; false when the
  *     path already existed (the caller lost). Two concurrent calls on
  *     one path must never both return true.
  *  2. [[publishExclusive]]: publish `content` at `p` such that
  *     (a) a reader either finds no file or the COMPLETE content —
  *     never a prefix (torn reads of a marker silently LOSE committed
  *     rows; the r13 race); (b) of N concurrent publishers of one
  *     path, exactly one returns true; losers return false with the
  *     winner's content intact; (c) a genuine I/O failure throws
  *     instead of returning false — callers treat `false` as "a
  *     competitor committed" and may delete their own staged data,
  *     which must never happen for a transient error.
  *
  * Implementations by storage class:
  *  - local `file://` and HDFS: [[LinkOrRenameStoreCommit]] (the
  *    default). On `file://` it commits with a POSIX hard link —
  *    `link(2)` fails atomically with EEXIST when the destination
  *    exists, the one local no-clobber primitive (rename REPLACES on
  *    POSIX, and Hadoop's LocalFileSystem rename is a bare
  *    `File.renameTo`, so rename-based publication silently loses
  *    raced commits — measured, not theorized: the contract spec
  *    fails 7-of-8-winners on rename). On HDFS it renames: HDFS
  *    rename refuses an existing destination and `create(p, false)`
  *    is atomic.
  *  - S3 / GCS / ABFS: no atomic no-clobber rename or link exists; an
  *    implementation must use the store's conditional write — S3
  *    `If-None-Match: *` conditional PUT, GCS
  *    `x-goog-if-generation-match: 0`, ABFS ETag preconditions — or
  *    an external catalog/lock service (the Iceberg/Delta catalog
  *    role). Both give exactly the one-winner semantics above; plain
  *    PUT-then-check does not (last-writer-wins).
  *
  * Installed process-wide via [[Store.setCommitService]]; metadata
  * objects are small (one manifest/marker per commit), so the
  * primitive is never on a data path. */
trait StoreCommit {

  /** Create an empty exclusion token at `p`: true iff created by this
    * call; false iff `p` already existed. Must never succeed twice. */
  def createExclusive(fs: FileSystem, p: Path): Boolean

  /** Atomically publish `content` at `p`: true iff this call's content
    * is now committed; false iff a competitor's is. Readers must never
    * see a partial object. Throws on genuine I/O failure (nothing
    * committed, retriable as-is). */
  def publishExclusive(fs: FileSystem, p: Path, content: String): Boolean
}

/** Default [[StoreCommit]]: hard-link commit on `file://` (atomic
  * EEXIST-failure — the only local primitive that cannot clobber),
  * staged rename on everything else (correct on HDFS, whose rename
  * refuses an existing destination). Publication always stages the
  * full content to a `t-<uuid>` sibling and closes it BEFORE the
  * commit step — close-before-visibility is what removes the
  * torn-read window of create-then-write publication. */
object LinkOrRenameStoreCommit extends StoreCommit {

  private def isLocal(fs: FileSystem): Boolean =
    fs.getUri.getScheme == "file"

  private def nio(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  override def createExclusive(fs: FileSystem, p: Path): Boolean =
    if (isLocal(fs)) {
      // O_CREAT|O_EXCL — atomic where Hadoop's local create(p, false)
      // is a racy exists-then-create
      try { java.nio.file.Files.createFile(nio(p)); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException =>
          java.nio.file.Files.createDirectories(nio(p).getParent)
          try { java.nio.file.Files.createFile(nio(p)); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    } else {
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }

  override def publishExclusive(
      fs: FileSystem, p: Path, content: String): Boolean = {
    // the uuid tmp name never collides, so an IOException while
    // staging is a real filesystem error, not a race — let it surface
    val tmp = new Path(p.getParent,
      s"t-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (isLocal(fs) && !linkUnsupported.get()) {
      // hard-link the staged inode to the final name: the name appears
      // with its complete content or not at all, and EEXIST makes the
      // loser loud — rename would silently REPLACE a raced winner here
      try {
        java.nio.file.Files.createLink(nio(p), nio(tmp))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
        case e @ (_: UnsupportedOperationException |
                  _: java.nio.file.FileSystemException) =>
          // a local filesystem WITHOUT hard links (exFAT, some FUSE /
          // network mounts): fall back to exists-probe + rename for
          // this process — weaker (a sub-ms same-path race can
          // clobber; see the trait doc), loudly noted once, and still
          // torn-read-free (content staged and closed before rename)
          if (linkUnsupported.compareAndSet(false, true))
            System.err.println(
              s"[graft.StoreCommit] hard links unsupported on this " +
                s"local filesystem (${e.getMessage}); falling back to " +
                s"exists-probe + rename — concurrent same-path commits " +
                s"lose the one-winner guarantee on this mount")
          renamePublish(fs, p, tmp)
      }
    } else {
      // non-local: rename must refuse an existing destination (HDFS
      // does). The exists-probe is belt-and-braces loser detection.
      renamePublish(fs, p, tmp)
    }
  }

  /** Once a local mount proves it cannot hard-link, stop retrying the
    * link per publish (the probe exception is not free and the answer
    * will not change for the process's lifetime). */
  private val linkUnsupported =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def renamePublish(
      fs: FileSystem, p: Path, tmp: Path): Boolean = {
    if (fs.exists(p)) { fs.delete(tmp, false); return false }
    val renamed =
      try fs.rename(tmp, p)
      catch { case _: java.io.IOException => false }
    if (!renamed) {
      val lost = fs.exists(p)
      fs.delete(tmp, false)
      if (lost) return false
      throw new IllegalStateException(
        s"publishing $p failed: rename from $tmp returned false but no " +
          s"competing file exists — filesystem error, not a commit race " +
          s"(nothing was committed; the operation can be retried as-is)")
    }
    true
  }
}
