package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-generation storage shared by every persisted store (the
  * MinHash signature table, the Hamming table, the PQ / IVF-PQ code
  * tables) — the operational layer under retire / compact / append.
  *
  * Layout of one RELATION (a store is a few relations under one root):
  *
  * {{{
  *   <relRoot>/g-000000001/          parquet data of generation 1
  *   <relRoot>/g-000000002/          parquet data of generation 2
  *   <relRoot>/_manifests/m-000000002   ← the pointer: highest m-N wins
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
  * Concurrency contract (checked, not assumed):
  *  - two concurrent REWRITES race on the same manifest name; the
  *    exclusive create makes the loser fail loudly instead of silently
  *    clobbering the winner;
  *  - an APPEND records the generation it resolved and re-checks it
  *    after writing ([[append]]) — an append overlapping a rewrite of
  *    the same relation fails loudly (the rewrite's snapshot cannot
  *    contain rows that landed after it started), telling the caller
  *    to replay the batch against the new generation;
  *  - a rewrite retains the immediately superseded generation (and
  *    deletes older ones), so a reader that resolved the pointer just
  *    before a commit can finish its scan; readers are expected to
  *    complete within one maintenance cycle (the snapshot-expiry
  *    grace every table format with time travel documents).
  *
  * Single-relation metadata that never changes after the build (the
  * `meta` / `codebook` / `centroids` relations) stays a plain
  * write-once parquet directory — immutability needs no generations.
  */
object Store {

  final case class Gen(n: Long, dataPath: String)

  private def manifestsDir(relRoot: String) = s"$relRoot/_manifests"
  private def genPath(relRoot: String, n: Long) = f"$relRoot/g-$n%09d"
  private def manifestName(n: Long) = f"m-$n%09d"

  private def fileSystem(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve the live generation of one relation: the highest-numbered
    * manifest file wins. Fails loudly when the relation does not exist
    * (no manifest directory or no manifest file). */
  def currentGen(spark: SparkSession, relRoot: String): Gen = {
    val dir = new org.apache.hadoop.fs.Path(manifestsDir(relRoot))
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
    Gen(n, genPath(relRoot, n))
  }

  /** Read the live generation of one relation. */
  def read(spark: SparkSession, relRoot: String): DataFrame =
    spark.read.parquet(currentGen(spark, relRoot).dataPath)

  /** Commit generation `n` by creating its manifest file EXCLUSIVELY —
    * the atomic pointer flip. A concurrent committer of the same
    * generation loses the create race and fails loudly. */
  private def commit(spark: SparkSession, relRoot: String, n: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(manifestsDir(relRoot))
    val fs = fileSystem(spark, dir)
    fs.mkdirs(dir)
    val mf = new org.apache.hadoop.fs.Path(dir, manifestName(n))
    val out =
      try fs.create(mf, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"store commit race on $relRoot generation $n: another writer " +
              s"committed first — replay this maintenance run against the " +
              s"new generation", e)
      }
    out.close()
  }

  /** Create (or overwrite) a relation as generation 1. */
  def create(df: DataFrame, relRoot: String,
             partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(relRoot)
    fileSystem(spark, root).delete(root, true)
    writeData(df, genPath(relRoot, 1L), partitionCols)
    commit(spark, relRoot, 1L)
  }

  /** Append to the live generation with the ingest-vs-maintenance
    * fence: the generation is resolved once, `write` lands its files
    * into that generation's directory, and the pointer is re-checked
    * afterwards — if a rewrite committed in between, the appended rows
    * are NOT part of the new generation (the rewrite read a snapshot
    * taken before them), so the append fails loudly and the caller
    * must replay the batch. The orphaned files sit in a superseded
    * generation directory and are removed with it. */
  def append(spark: SparkSession, relRoot: String)(
      write: String => Unit): Unit = {
    val g = currentGen(spark, relRoot)
    write(g.dataPath)
    val now = currentGen(spark, relRoot)
    if (now.n != g.n) throw new IllegalStateException(
      s"append to $relRoot lost a race with a concurrent rewrite " +
        s"(generation ${g.n} was superseded by ${now.n} while the batch " +
        s"was writing) — replay the batch against the new generation")
  }

  /** Replace the relation's content with `out` as a new generation:
    * write the new directory, flip the manifest pointer (atomic
    * single-file create), then delete every generation OLDER than the
    * one just superseded (which is retained one cycle for in-flight
    * readers). Refuses an EMPTY rewrite — a zero-row parquet relation
    * is unreadable (no schema to infer) and a takedown that empties a
    * store should be a rebuild decision, not an opaque crash on the
    * next batch. */
  def rewrite(spark: SparkSession, relRoot: String, out: DataFrame,
              numFiles: Int, partitionCols: Seq[String] = Nil): Unit = {
    val g = currentGen(spark, relRoot)
    if (out.isEmpty) throw new IllegalStateException(
      s"rewrite of $relRoot would leave the relation EMPTY — an empty " +
        s"parquet relation cannot be re-read (no schema); if the intent " +
        s"is to drop the whole store, delete and rebuild it instead")
    // partitioned relations rewrite partitioned; with numFiles the
    // hash-repartition on the partition columns lands every directory
    // on exactly one task → one file per partition dir
    val shaped =
      if (partitionCols.nonEmpty)
        if (numFiles > 0) out.repartition(numFiles, partitionCols.map(col): _*)
        else out
      else if (numFiles > 0) out.coalesce(numFiles)
      else out
    writeData(shaped, genPath(relRoot, g.n + 1), partitionCols)
    commit(spark, relRoot, g.n + 1)
    dropGenerationsBelow(spark, relRoot, g.n)
  }

  private def writeData(df: DataFrame, dataPath: String,
                        partitionCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(dataPath)
  }

  /** Delete generation directories strictly below `keep` — the
    * retention sweep after a commit (the superseded generation itself
    * survives one cycle for in-flight readers). */
  private def dropGenerationsBelow(
      spark: SparkSession, relRoot: String, keep: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(relRoot)
    val fs = fileSystem(spark, root)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("g-") && name.drop(2).forall(_.isDigit) &&
        name.drop(2).toLong < keep)
        fs.delete(st.getPath, true)
    }
    val mdir = new org.apache.hadoop.fs.Path(manifestsDir(relRoot))
    fs.listStatus(mdir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("m-") && name.drop(2).toLong < keep)
        fs.delete(st.getPath, false)
    }
  }

  /** Parquet part-file count of the relation's LIVE generation
    * (recursive — partitioned relations count across partition dirs).
    * The compaction signal every store's stats query reports. */
  def partFileCount(spark: SparkSession, relRoot: String): Long = {
    val g = currentGen(spark, relRoot)
    val p = new org.apache.hadoop.fs.Path(g.dataPath)
    val fs = fileSystem(spark, p)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
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
