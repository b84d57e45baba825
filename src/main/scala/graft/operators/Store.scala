package graft.operators

import graft.sources.ManifestFileIndex

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned-generation storage shared by every persisted store (the
  * MinHash signature table, the Hamming table, the PQ / IVF-PQ code
  * tables, the paragraph-hash table) — the operational layer under
  * retire / compact / append.
  *
  * Layout of one RELATION (a store is a few relations under one root):
  *
  * {{{
  *   <relRoot>/g-000000001/            parquet data of generation 1
  *   <relRoot>/g-000000002-4f2a91c0/   generation 2 (unique dir per rewrite
  *                                     attempt, so raced rewrites can never
  *                                     clobber each other's files)
  *   <relRoot>/g-NNN.../a-<uuid>/      one subdirectory per APPEND batch
  *   <relRoot>/_manifests/m-000000002  the pointer: highest m-N wins; its
  *                                     content records the generation's
  *                                     directory name, schema and FILE LIST
  *   <relRoot>/_manifests/a-000000002-<uuid>  append marker: the batch's
  *                                     file list, relative to the gen dir
  *   <relRoot>/_manifests/r-000000003  rewrite INTENT (exists only while a
  *                                     rewrite is in flight toward gen 3)
  * }}}
  *
  * Why a manifest pointer instead of renaming directories into place:
  * on object stores (the 100 TB posture) a directory rename is a
  * non-atomic O(bytes) copy, and even on HDFS a rename-aside /
  * rename-into-place swap leaves a headless window in which a reader
  * finds no relation at all. Here a rewrite (a) writes the new
  * generation to its own immutable directory, (b) commits by CREATING
  * one small manifest file — a single-object create, atomic on HDFS
  * and a single PUT on object stores — and (c) only then retires old
  * generations. A reader always resolves EITHER the old or the new
  * generation, never none.
  *
  * Why the manifest records the FILE LIST (with sizes and the data
  * schema): opening the relation then costs one directory listing of
  * `_manifests` plus one small-file read per manifest/marker — never a
  * recursive walk of the data directories. A partitioned code table
  * with nlist ~10⁵ list directories costs an object-store LIST storm
  * per cold open under directory discovery; under the manifest it is
  * a constant ([[ManifestFileIndex]] serves the scan's file index with
  * zero filesystem calls, and partition pruning / DPP work unchanged).
  *
  * Concurrency contract (checked in BOTH orderings, not assumed):
  *  - two concurrent REWRITES race on the same intent name; the
  *    exclusive create makes the loser fail loudly before it writes a
  *    byte of data, and unique generation directories mean even a
  *    pathological loser cannot clobber the winner's files;
  *  - an APPEND writes its batch into a fresh subdirectory of the live
  *    generation, then publishes it with a marker file. It fails
  *    loudly — before reporting success — if a rewrite INTENT exists
  *    or the generation pointer moved ([[append]]), telling the caller
  *    to replay the batch against the new generation;
  *  - a REWRITE declares its intent first (blocking new appends),
  *    re-checks the marker set immediately before its commit, and
  *    fails loudly if an append published a marker after the
  *    rewrite's input snapshot was taken ([[rewrite]] takes the
  *    [[Snap]] the caller read, so the check is against the files the
  *    output plan actually saw). The two sides close both orderings:
  *    a marker published before the intent is seen by the pre-commit
  *    re-check (the rewrite aborts); an append that starts after the
  *    intent sees the intent and fails (the rewrite proceeds). Either
  *    way no appended row is ever silently absent from a committed
  *    generation;
  *  - a rewrite retains the immediately superseded generation (and
  *    deletes older ones), so a reader that resolved the pointer just
  *    before a commit can finish its scan; readers are expected to
  *    complete within one maintenance cycle (the snapshot-expiry
  *    grace every table format with time travel documents);
  *  - a rewrite that CRASHES between intent and commit leaves its
  *    intent file behind, which blocks appends and rewrites loudly
  *    (never silently) until [[clearStaleIntent]] — the janitor call
  *    every table format documents for abandoned transactions.
  *
  * Generations written by rounds before the file-list manifest (their
  * manifest files are EMPTY) stay readable through directory
  * discovery, and their appends keep the r11 semantics (direct write
  * into the generation directory, pointer re-check plus intent check);
  * the first rewrite upgrades the relation to the new format. For
  * those legacy generations the rewrite-side fence re-lists the data
  * directory instead of the marker set — same guarantee, one extra
  * listing, paid only until the upgrade.
  *
  * Single-relation metadata that never changes after the build (the
  * `meta` / `codebook` / `centroids` relations) stays a plain
  * write-once parquet directory — immutability needs no generations.
  */
object Store {

  final case class Gen(n: Long, dataPath: String)

  /** A resolved read snapshot of one relation: the generation it
    * bound, the fence state observed when the file list was read
    * (v2: the set of append-marker names; legacy: the data
    * directory's `relPath:size` fingerprint), and the DataFrame over
    * exactly those files. [[rewrite]] REQUIRES the snapshot its output
    * was derived from — that is what makes the ingest-vs-maintenance
    * fence sound in the ordering where the append lands between the
    * caller's read and the rewrite's commit. */
  final case class Snap(
      relRoot: String, gen: Gen, fence: Set[String], legacy: Boolean,
      df: DataFrame)

  private def manifestsDir(relRoot: String) = s"$relRoot/_manifests"
  private def legacyGenPath(relRoot: String, n: Long) = f"$relRoot/g-$n%09d"
  private def manifestName(n: Long) = f"m-$n%09d"
  private def intentName(n: Long) = f"r-$n%09d"
  private def markerPrefix(n: Long) = f"a-$n%09d-"

  private def fileSystem(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) =
    java.net.URLDecoder.decode(s, "UTF-8")

  private val FormatTag = "graft-store-v2"

  /** Parsed manifest content (None = legacy empty manifest). */
  private final case class Manifest(
      dirName: String, partitionSchema: StructType, dataSchema: StructType,
      files: Seq[(String, Long)])

  private def renderManifest(
      dirName: String, partitionSchema: StructType, dataSchema: StructType,
      files: Seq[(String, Long)]): String = {
    val sb = new StringBuilder
    sb.append(FormatTag).append('\n')
    sb.append("d\t").append(enc(dirName)).append('\n')
    sb.append("p\t").append(enc(partitionSchema.json)).append('\n')
    sb.append("s\t").append(enc(dataSchema.json)).append('\n')
    files.foreach { case (rel, size) =>
      sb.append("f\t").append(enc(rel)).append('\t').append(size).append('\n')
    }
    sb.result()
  }

  private def renderMarker(files: Seq[(String, Long)]): String =
    files.map { case (rel, size) => s"f\t${enc(rel)}\t$size" }
      .mkString("", "\n", "\n")

  private def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def parseFileLines(content: String): Seq[(String, Long)] =
    content.linesIterator.filter(_.startsWith("f\t")).map { l =>
      val parts = l.split('\t')
      (dec(parts(1)), parts(2).toLong)
    }.toSeq

  private def parseManifest(content: String): Option[Manifest] = {
    if (!content.startsWith(FormatTag)) return None
    var dirName: String = null
    var pSchema: StructType = null
    var dSchema: StructType = null
    content.linesIterator.foreach { l =>
      if (l.startsWith("d\t")) dirName = dec(l.drop(2))
      else if (l.startsWith("p\t"))
        pSchema = DataType.fromJson(dec(l.drop(2))).asInstanceOf[StructType]
      else if (l.startsWith("s\t"))
        dSchema = DataType.fromJson(dec(l.drop(2))).asInstanceOf[StructType]
    }
    Some(Manifest(dirName, pSchema, dSchema, parseFileLines(content)))
  }

  private def writeExclusive(
      fs: FileSystem, p: Path, content: String)(onRace: => Nothing): Unit = {
    val out =
      try fs.create(p, false)
      catch { case _: java.io.IOException => onRace }
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** One `_manifests` listing, shared by every resolution step: the
    * live generation number, its marker names, and any pending rewrite
    * intents (targets above the live generation). */
  private final case class State(
      n: Long, markers: Set[String], intents: Set[String])

  private def listState(spark: SparkSession, relRoot: String): State = {
    val dir = new Path(manifestsDir(relRoot))
    val fs = fileSystem(spark, dir)
    val names =
      try fs.listStatus(dir).map(_.getPath.getName)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"no store relation at $relRoot: missing ${manifestsDir(relRoot)}")
      }
    val gens = names.filter(_.startsWith("m-")).map(_.drop(2).toLong)
    if (gens.isEmpty) throw new IllegalStateException(
      s"no store relation at $relRoot: ${manifestsDir(relRoot)} holds no manifest")
    val n = gens.max
    State(n,
      names.filter(_.startsWith(markerPrefix(n))).toSet,
      names.filter(nm => nm.startsWith("r-") && nm.drop(2).toLong > n).toSet)
  }

  private def loadManifest(
      spark: SparkSession, relRoot: String, n: Long): Option[Manifest] = {
    val mf = new Path(manifestsDir(relRoot), manifestName(n))
    val fs = fileSystem(spark, mf)
    val content = readSmallFile(fs, mf)
    parseManifest(content)
  }

  /** Resolve the live generation of one relation: the highest-numbered
    * manifest file wins. Fails loudly when the relation does not exist
    * (no manifest directory or no manifest file). */
  def currentGen(spark: SparkSession, relRoot: String): Gen = {
    val st = listState(spark, relRoot)
    loadManifest(spark, relRoot, st.n) match {
      case Some(m) => Gen(st.n, s"$relRoot/${m.dirName}")
      case None => Gen(st.n, legacyGenPath(relRoot, st.n))
    }
  }

  /** Resolve a read snapshot: the generation, its fence state, and a
    * DataFrame over exactly the files the manifest plus the current
    * append markers record — the file index is built from the manifest
    * ([[ManifestFileIndex]]), so no data directory is ever listed. */
  def snapshot(spark: SparkSession, relRoot: String): Snap = {
    val st = listState(spark, relRoot)
    loadManifest(spark, relRoot, st.n) match {
      case Some(m) =>
        val mdir = new Path(manifestsDir(relRoot))
        val fs = fileSystem(spark, mdir)
        val markerFiles = st.markers.toSeq.sorted.flatMap { name =>
          parseFileLines(readSmallFile(fs, new Path(mdir, name)))
        }
        val dataPath = s"$relRoot/${m.dirName}"
        val df = manifestDf(spark, dataPath, m.files ++ markerFiles,
          m.partitionSchema, m.dataSchema)
        Snap(relRoot, Gen(st.n, dataPath), st.markers, legacy = false, df)
      case None =>
        val dataPath = legacyGenPath(relRoot, st.n)
        val df = spark.read.parquet(dataPath)
        Snap(relRoot, Gen(st.n, dataPath),
          legacyFingerprint(spark, dataPath), legacy = true, df)
    }
  }

  /** Read the live generation of one relation. */
  def read(spark: SparkSession, relRoot: String): DataFrame =
    snapshot(spark, relRoot).df

  private def manifestDf(
      spark: SparkSession, dataPath: String, files: Seq[(String, Long)],
      partitionSchema: StructType, dataSchema: StructType): DataFrame = {
    val base = new Path(dataPath)
    val qualified = fileSystem(spark, base).makeQualified(base)
    val index = new ManifestFileIndex(spark, qualified, files, partitionSchema)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.baseRelationToDataFrame(HadoopFsRelation(
      index, partitionSchema, dataSchema, None, new ParquetFileFormat,
      Map.empty[String, String])(classic))
  }

  private def legacyFingerprint(
      spark: SparkSession, dataPath: String): Set[String] = {
    val p = new Path(dataPath)
    val fs = fileSystem(spark, p)
    val it = fs.listFiles(p, true)
    val b = Set.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        b += s"${f.getPath.getName}:${f.getLen}"
    }
    b.result()
  }

  /** Recursive `.parquet` listing of a directory the CALLER just wrote
    * — O(own output), the only data-directory walk left in the layer. */
  private def listWritten(
      fs: FileSystem, dir: Path): Seq[(String, Long)] = {
    val base = fs.makeQualified(dir).toString
    val it = fs.listFiles(dir, true)
    val b = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val full = f.getPath.toString
        require(full.startsWith(base + "/"),
          s"listed file $full escapes $base")
        b += ((full.drop(base.length + 1), f.getLen))
      }
    }
    b.result()
  }

  private def splitSchema(
      schema: StructType, partitionCols: Seq[String]): (StructType, StructType) = {
    val pFields = partitionCols.map(c =>
      schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"partition column $c absent from schema ${schema.simpleString}")))
    val dFields = schema.fields.filterNot(f =>
      partitionCols.exists(_.equalsIgnoreCase(f.name)))
    // top-level nullable: parquet discovery reads the same way, and a
    // later append may legitimately carry nulls where the first write
    // happened not to
    (StructType(pFields.map(_.copy(nullable = true)).toArray),
      StructType(dFields.map(_.copy(nullable = true))))
  }

  /** Create (or overwrite) a relation as generation 1. */
  def create(df: DataFrame, relRoot: String,
             partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val root = new Path(relRoot)
    val fs = fileSystem(spark, root)
    fs.delete(root, true)
    val dirName = f"g-${1L}%09d"
    val dataPath = new Path(root, dirName)
    writeData(df, dataPath.toString, partitionCols)
    val (pSchema, dSchema) = splitSchema(df.schema, partitionCols)
    val files = listWritten(fs, dataPath)
    fs.mkdirs(new Path(manifestsDir(relRoot)))
    writeExclusive(fs, new Path(manifestsDir(relRoot), manifestName(1L)),
      renderManifest(dirName, pSchema, dSchema, files)) {
      throw new IllegalStateException(
        s"store create race on $relRoot: another writer committed " +
          s"generation 1 first")
    }
  }

  /** Append to the live generation with the ingest-vs-maintenance
    * fence. The batch lands in its own fresh subdirectory of the live
    * generation (`write` receives that path), is published by an
    * append MARKER (readers see the rows only once the marker exists —
    * no partial-batch visibility), and the append reports success only
    * if, after the marker is visible, the generation pointer is
    * unchanged and no rewrite intent exists. In every interleaving
    * with a concurrent [[rewrite]] at least one side fails loudly:
    * rows can never be silently absent from a committed generation.
    * On failure the caller must replay the batch against the new
    * generation (the marker is withdrawn; the orphaned files die with
    * their generation directory one retention cycle later). */
  def append(spark: SparkSession, relRoot: String)(
      write: String => Unit): Unit = {
    val st0 = listState(spark, relRoot)
    failIfIntent(relRoot, st0, "append")
    val manifest = loadManifest(spark, relRoot, st0.n)
    val mdir = new Path(manifestsDir(relRoot))
    val fs = fileSystem(spark, mdir)
    manifest match {
      case None =>
        // legacy generation: files must land where directory discovery
        // finds them; the fence is the pointer re-check + intent check
        write(legacyGenPath(relRoot, st0.n))
        val st1 = listState(spark, relRoot)
        failIfIntent(relRoot, st1, "append")
        failIfMoved(relRoot, st0.n, st1.n)
      case Some(m) =>
        val sub = s"a-${java.util.UUID.randomUUID.toString.take(8)}"
        val subPath = new Path(s"$relRoot/${m.dirName}/$sub")
        write(subPath.toString)
        val written = listWritten(fs, subPath).map {
          case (rel, size) => (s"$sub/$rel", size)
        }
        if (written.isEmpty) return
        // publish gate 1: don't even publish under a live rewrite
        val st1 = listState(spark, relRoot)
        failIfIntent(relRoot, st1, "append")
        failIfMoved(relRoot, st0.n, st1.n)
        val markerName = markerPrefix(st0.n) +
          java.util.UUID.randomUUID.toString.take(8)
        val marker = new Path(mdir, markerName)
        writeExclusive(fs, marker, renderMarker(written)) {
          throw new IllegalStateException(
            s"append marker collision on $relRoot — retry the batch")
        }
        // publish gate 2: a rewrite intent that raced the marker means
        // the rewrite may not have seen it — withdraw and replay
        val st2 = listState(spark, relRoot)
        if (st2.intents.nonEmpty || st2.n != st0.n) {
          if (!fs.delete(marker, false))
            throw new IllegalStateException(
              s"append to $relRoot lost a race with a concurrent rewrite " +
                s"AND could not withdraw its marker $markerName — remove it " +
                s"manually before replaying, or the batch may double-apply")
          failIfIntent(relRoot, st2, "append")
          failIfMoved(relRoot, st0.n, st2.n)
        }
    }
  }

  private def failIfIntent(
      relRoot: String, st: State, op: String): Unit =
    if (st.intents.nonEmpty) throw new IllegalStateException(
      s"$op to $relRoot blocked: a rewrite is in flight " +
        s"(intent ${st.intents.toSeq.sorted.mkString(", ")} present) — " +
        s"replay once it completes; if the intent is stale (a crashed " +
        s"rewrite), clear it with Store.clearStaleIntent")

  private def failIfMoved(relRoot: String, was: Long, now: Long): Unit =
    if (now != was) throw new IllegalStateException(
      s"append to $relRoot lost a race with a concurrent rewrite " +
        s"(generation $was was superseded by $now while the batch " +
        s"was writing) — replay the batch against the new generation")

  /** Replace the relation's content with `out` as a new generation.
    * `snap` MUST be the snapshot `out` was derived from — the fence
    * compares the marker set at commit time against the marker set the
    * output plan actually read, so an append landing anywhere between
    * the caller's [[snapshot]] and this commit aborts the rewrite
    * loudly instead of silently losing the appended rows.
    *
    * Protocol: declare intent (exclusive create — a racing rewrite
    * loses HERE, before writing data; new appends fail from this point
    * on), verify the pointer still matches the snapshot, write the new
    * generation to its own unique directory, re-check the fence, commit
    * the manifest (atomic single-file create), withdraw the intent,
    * then delete every generation OLDER than the one just superseded
    * (which is retained one cycle for in-flight readers).
    *
    * Refuses an EMPTY rewrite — a takedown that empties a store should
    * be a rebuild decision, not an accident (and the check is free:
    * one `limit(1)` probe of the output plan). */
  def rewrite(snap: Snap, out: DataFrame, numFiles: Int,
              partitionCols: Seq[String] = Nil): Unit = {
    val spark = out.sparkSession
    val relRoot = snap.relRoot
    if (out.isEmpty) throw new IllegalStateException(
      s"rewrite of $relRoot would leave the relation EMPTY — if the " +
        s"intent is to drop the whole store, delete and rebuild it instead")
    val n1 = snap.gen.n + 1
    val mdir = new Path(manifestsDir(relRoot))
    val fs = fileSystem(spark, mdir)
    val intent = new Path(mdir, intentName(n1))
    writeExclusive(fs, intent, "") {
      throw new IllegalStateException(
        s"store rewrite race on $relRoot toward generation $n1: another " +
          s"rewrite is in flight (or crashed leaving a stale intent — " +
          s"clear it with Store.clearStaleIntent) — replay this " +
          s"maintenance run against the live generation")
    }
    var committed = false
    var dataPath: Path = null
    try {
      val stNow = listState(spark, relRoot)
      if (stNow.n != snap.gen.n) throw new IllegalStateException(
        s"rewrite of $relRoot is based on a superseded snapshot " +
          s"(generation ${snap.gen.n}, live is ${stNow.n}) — re-read and " +
          s"replay the maintenance run")
      val shaped =
        if (partitionCols.nonEmpty)
          if (numFiles > 0) out.repartition(numFiles, partitionCols.map(col): _*)
          else out
        else if (numFiles > 0) out.coalesce(numFiles)
        else out
      val dirName =
        f"g-$n1%09d-${java.util.UUID.randomUUID.toString.take(8)}"
      dataPath = new Path(relRoot, dirName)
      writeData(shaped, dataPath.toString, partitionCols)
      // the fence, rewrite side: anything appended after the snapshot?
      val lateAppend =
        if (snap.legacy)
          legacyFingerprint(spark, snap.gen.dataPath) != snap.fence
        else
          (listState(spark, relRoot).markers -- snap.fence).nonEmpty
      if (lateAppend) throw new IllegalStateException(
        s"rewrite of $relRoot aborted: an append landed on generation " +
          s"${snap.gen.n} after this rewrite's input snapshot was taken — " +
          s"its rows would be silently absent from generation $n1; replay " +
          s"the maintenance run against the live generation")
      val (pSchema, dSchema) = splitSchema(out.schema, partitionCols)
      val files = listWritten(fs, dataPath)
      writeExclusive(fs, new Path(mdir, manifestName(n1)),
        renderManifest(dirName, pSchema, dSchema, files)) {
        throw new IllegalStateException(
          s"store commit race on $relRoot generation $n1: another writer " +
            s"committed first — replay this maintenance run against the " +
            s"new generation")
      }
      committed = true
    } finally {
      if (!committed && dataPath != null) fs.delete(dataPath, true)
      fs.delete(intent, false)
    }
    dropGenerationsBelow(spark, relRoot, snap.gen.n)
  }

  /** Remove a stale rewrite intent left by a crashed rewrite — the
    * janitor call. Only safe when no rewrite is actually in flight
    * (the caller's operational judgment, as with every table format's
    * abandoned-transaction cleanup). */
  def clearStaleIntent(spark: SparkSession, relRoot: String): Unit = {
    val st = listState(spark, relRoot)
    val mdir = new Path(manifestsDir(relRoot))
    val fs = fileSystem(spark, mdir)
    st.intents.foreach(name => fs.delete(new Path(mdir, name), false))
  }

  private def writeData(df: DataFrame, dataPath: String,
                        partitionCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(dataPath)
  }

  private def genNumberOf(dirName: String): Option[Long] = {
    if (!dirName.startsWith("g-")) return None
    val digits = dirName.drop(2).takeWhile(_.isDigit)
    if (digits.isEmpty) None
    else if (dirName.length == 2 + digits.length ||
      dirName.charAt(2 + digits.length) == '-') Some(digits.toLong)
    else None
  }

  /** Delete generation directories (and their manifests, markers and
    * stale intents) strictly below `keep` — the retention sweep after
    * a commit (the superseded generation itself survives one cycle for
    * in-flight readers). Also sweeps data directories of ABORTED
    * rewrites (a `g-N-*` directory with no manifest and N below the
    * live generation can only be a loser's leftovers). */
  private def dropGenerationsBelow(
      spark: SparkSession, relRoot: String, keep: Long): Unit = {
    val root = new Path(relRoot)
    val fs = fileSystem(spark, root)
    fs.listStatus(root).foreach { st =>
      genNumberOf(st.getPath.getName).foreach { n =>
        if (n < keep) fs.delete(st.getPath, true)
      }
    }
    val mdir = new Path(manifestsDir(relRoot))
    fs.listStatus(mdir).foreach { st =>
      val name = st.getPath.getName
      val stale =
        (name.startsWith("m-") && name.drop(2).toLong < keep) ||
          (name.startsWith("a-") &&
            name.drop(2).takeWhile(_.isDigit).toLong < keep) ||
          (name.startsWith("r-") && name.drop(2).toLong <= keep)
      if (stale) fs.delete(st.getPath, false)
    }
  }

  /** Parquet part-file count of the relation's LIVE generation. For a
    * manifest generation this is a line count over the manifest and
    * its markers (no filesystem walk); legacy generations fall back to
    * the recursive listing. The compaction signal every store's stats
    * query reports. */
  def partFileCount(spark: SparkSession, relRoot: String): Long = {
    val st = listState(spark, relRoot)
    loadManifest(spark, relRoot, st.n) match {
      case Some(m) =>
        val mdir = new Path(manifestsDir(relRoot))
        val fs = fileSystem(spark, mdir)
        m.files.size.toLong + st.markers.toSeq.map(name =>
          parseFileLines(readSmallFile(fs, new Path(mdir, name))).size.toLong).sum
      case None =>
        val p = new Path(legacyGenPath(relRoot, st.n))
        val fs = fileSystem(spark, p)
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        }
        n
    }
  }

  /** Resolve a retirement list against the STORE'S OWN id type — the
    * takedown-safety check: a retirement id that does not survive a
    * round-trip through the store's id type (a string against a long
    * store, an overflowing long against an int store) can never match
    * a stored row, so instead of silently retiring nothing the call
    * fails loudly. Returns the distinct, store-typed id relation,
    * materialized (tiny by the takedown-list contract). */
  private[operators] def retireIds(
      store: DataFrame, storeIdCol: String,
      retired: DataFrame, idCol: String): DataFrame = {
    val dt = store.schema(storeIdCol).dataType
    val origType = retired.schema(idCol).dataType
    // try_cast, not cast: ANSI mode turns a malformed cast into a
    // runtime error mid-takedown; here a failed conversion must
    // surface as THIS check's loud, actionable message instead
    val cast = retired.select(col(idCol).as("__orig")).distinct()
      .withColumn("id", col("__orig").try_cast(dt))
      .localCheckpoint(true)
    val lossy = cast
      .filter(col("__orig").isNotNull &&
        !(col("id").try_cast(origType) <=> col("__orig")))
      .limit(1).collect()
    if (lossy.nonEmpty) throw new IllegalArgumentException(
      s"retirement id ${lossy.head.get(0)} (type $origType) does not " +
        s"round-trip through the store's id type $dt — it could never " +
        s"match a stored row; pass ids of the store's own type")
    cast.select(col("id")).filter(col("id").isNotNull)
  }
}
