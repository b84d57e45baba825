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
  *    [[InMemoryConditionalPutStoreCommit]] is the executable REFERENCE
  *    BEHAVIOR for this class: the same atomic-decision-then-visible
  *    shape with the store's server-side conditional write replaced by
  *    a process-local ledger, green against the contract spec — a real
  *    object-store implementation should match it decision-for-decision
  *    and pass the same spec block verbatim.
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

  /** Schemes whose rename is a non-atomic copy+delete (or a blind
    * overwrite): the one-winner and torn-read guarantees DEGRADE there,
    * and unlike the local no-hardlink fallback that degradation would
    * otherwise be silent — warn once per process that a conditional-PUT
    * / catalog [[StoreCommit]] must be installed
    * ([[Store.setCommitService]]; [[InMemoryConditionalPutStoreCommit]]
    * is the reference behavior to match). */
  private val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
      "oss", "cos", "swift")

  private val objectStoreWarned =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def warnIfObjectStore(fs: FileSystem): Unit = {
    val scheme = fs.getUri.getScheme
    if (scheme != null && ObjectStoreSchemes.contains(scheme.toLowerCase) &&
      objectStoreWarned.compareAndSet(false, true))
      System.err.println(
        s"[graft.StoreCommit] commit target uses object-store scheme " +
          s"'$scheme', where rename is not an atomic no-clobber " +
          s"operation — the one-winner commit guarantee does NOT hold " +
          s"with the default StoreCommit; install a conditional-PUT or " +
          s"catalog implementation via Store.setCommitService (see the " +
          s"StoreCommit trait contract and " +
          s"InMemoryConditionalPutStoreCommit for the reference behavior)")
  }

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
      warnIfObjectStore(fs)
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
        // Hadoop's checksummed LocalFileSystem wrote a `.t-<uuid>.crc`
        // sibling for the staged file; the hard link commits only the
        // data inode, so link the checksum along (its content is
        // name-independent per-chunk CRCs) — otherwise local metadata
        // reads silently lose checksum verification (ADVICE r14).
        // Best-effort: a raw (unchecksummed) fs has no sibling.
        val tmpCrc = nio(new Path(tmp.getParent, s".${tmp.getName}.crc"))
        if (java.nio.file.Files.exists(tmpCrc)) {
          try java.nio.file.Files.createLink(
            nio(new Path(p.getParent, s".${p.getName}.crc")), tmpCrc)
          catch { case _: java.io.IOException => () }
        }
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
      // does; object stores do NOT — warn once and point at the
      // conditional-PUT contract). The exists-probe is belt-and-braces
      // loser detection.
      warnIfObjectStore(fs)
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

/** CONDITIONAL-PUT [[StoreCommit]] with an in-memory ledger — the
  * executable reference behavior for the object-store implementation
  * class the trait documents, and the proof that the documented
  * contract is implementable by something other than link/rename
  * (StoreMaintenanceSpec runs the full contract spec against this
  * implementation verbatim, next to the default).
  *
  * Shape of a real S3/GCS/ABFS commit, piece by piece:
  *
  *  - The COMMIT DECISION is one atomic conditional write keyed by the
  *    object name: here `ConcurrentHashMap.compute` per fully-qualified
  *    path (all racers of one name serialize through it; exactly one
  *    sees "absent" and wins), on S3 the server-side
  *    `If-None-Match: *` PUT, on GCS `x-goog-if-generation-match: 0`,
  *    on ABFS an ETag precondition. Losers return false without
  *    touching the winner's object.
  *  - VISIBILITY follows the decision atomically: the winner
  *    materializes the complete content inside the same atomic section
  *    (staged sibling + rename on the backing fs — readers see the
  *    whole object or none), the way a conditional PUT's success IS the
  *    object becoming readable.
  *  - DELETED objects accept a new conditional write: the protocol
  *    deletes metadata out-of-band (withdrawn append markers, retention
  *    sweeps, cleared intents go through `fs.delete`, not this seam),
  *    so the decision treats "ledger entry present but object absent"
  *    as deleted — the generation-precondition reset a real store does
  *    server-side. Without it a cleared rewrite intent would block
  *    every later rewrite toward the same generation number.
  *
  * The ledger is process-local, so cross-PROCESS exclusion still comes
  * from the backing filesystem's own semantics — this implementation
  * exists to pin the contract's decision logic and to test the Store
  * protocol end-to-end over a non-default commit substrate, not to
  * replace a real object-store client. A real implementation deletes
  * the ledger and keeps everything else. */
final class InMemoryConditionalPutStoreCommit extends StoreCommit {

  private val ledger =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def key(fs: FileSystem, p: Path): String =
    fs.makeQualified(p).toString

  /** One atomic conditional write: serialize racers of one name, treat
    * an out-of-band-deleted object as absent, materialize inside the
    * winning decision. An I/O failure while materializing propagates
    * (nothing committed, ledger entry not set — retriable as-is). */
  private def conditionalPut(
      fs: FileSystem, p: Path)(materialize: () => Unit): Boolean = {
    var won = false
    ledger.compute(key(fs, p), (_, existing) => {
      if (existing != null && fs.exists(p)) existing
      else {
        materialize()
        won = true
        java.lang.Boolean.TRUE
      }
    })
    won
  }

  override def createExclusive(fs: FileSystem, p: Path): Boolean =
    conditionalPut(fs, p) { () =>
      fs.mkdirs(p.getParent)
      fs.create(p, true).close()
    }

  override def publishExclusive(
      fs: FileSystem, p: Path, content: String): Boolean =
    conditionalPut(fs, p) { () =>
      // stage + rename inside the atomic decision: a reader never sees
      // a partial object, and by the time the winner returns the
      // committed content is readable (the conditional PUT's own
      // visibility contract)
      val tmp = new Path(p.getParent,
        s"t-${java.util.UUID.randomUUID.toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"conditional-put materialization of $p failed: rename from " +
            s"$tmp returned false under the winning decision — " +
            s"filesystem error (nothing committed; retriable as-is)")
      }
    }
}
