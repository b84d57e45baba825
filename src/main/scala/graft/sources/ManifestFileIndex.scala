package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] served entirely from an already-loaded manifest —
  * the O(1)-open half of the `graft.operators.Store` generation layer
  * (the same shape every manifest-pointer table format uses: the
  * commit records the generation's file list, so opening the relation
  * costs one manifest read instead of a recursive directory walk —
  * at nlist ~10⁵ partition directories on an object store, discovery
  * is a LIST storm per cold open; this is a constant).
  *
  * `files` are `(path relative to basePath, size in bytes)` as
  * recorded at commit time. Partition values are parsed from the
  * `k=v` path segments (Spark's own layout, written by `partitionBy`)
  * against the recorded `partitionSchema` — no footer reads, no
  * directory listings, no `getFileStatus` calls: the scan's first
  * filesystem touch is the executor-side read of a file that survived
  * partition pruning.
  *
  * Static partition filters prune here (the scan trusts
  * `listFiles`); dynamic-partition-pruning filters are evaluated by
  * `FileSourceScanExec` itself over the returned partitions, so DPP
  * (the IVF-PQ probed-list prune) works unchanged.
  */
final class ManifestFileIndex(
    spark: SparkSession,
    basePath: Path,
    files: Seq[(String, Long)],
    override val partitionSchema: StructType) extends FileIndex {

  private val partitions: Seq[PartitionDirectory] = {
    val byValues = files
      .map { case (rel, size) =>
        (partitionValuesOf(rel), new FileStatus(
          size, false, 1, 134217728L, 0L, new Path(basePath, rel)))
      }
      .groupBy(_._1)
    byValues.toSeq.map { case (values, fs) =>
      PartitionDirectory(InternalRow.fromSeq(values), fs.map(_._2).toArray)
    }
  }

  private def partitionValuesOf(relPath: String): Seq[Any] = {
    if (partitionSchema.isEmpty) return Nil
    val kv = relPath.split('/').dropRight(1)
      .flatMap { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) None
        else Some(ExternalCatalogUtils.unescapePathName(seg.take(i)) ->
          ExternalCatalogUtils.unescapePathName(seg.drop(i + 1)))
      }.toMap
    partitionSchema.fields.toSeq.map { f =>
      val raw = kv.getOrElse(f.name, kv.collectFirst {
        case (k, v) if k.equalsIgnoreCase(f.name) => v
      }.getOrElse(throw new IllegalStateException(
        s"manifest file '$relPath' carries no '${f.name}=' partition " +
          s"segment — the manifest and its partition schema disagree")))
      if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
      else castPartitionValue(raw, f.dataType, relPath)
    }
  }

  private def castPartitionValue(
      raw: String, dt: DataType, relPath: String): Any = dt match {
    case IntegerType => raw.toInt
    case LongType => raw.toLong
    case ShortType => raw.toShort
    case ByteType => raw.toByte
    case BooleanType => raw.toBoolean
    case FloatType => raw.toFloat
    case DoubleType => raw.toDouble
    case StringType => UTF8String.fromString(raw)
    case _ => throw new IllegalArgumentException(
      s"unsupported partition column type $dt (file '$relPath') — the " +
        s"store layer partitions on integral/string keys only")
  }

  override def rootPaths: Seq[Path] = Seq(basePath)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val usable = partitionFilters.filter(
      _.references.forall(a =>
        partitionSchema.fields.exists(_.name.equalsIgnoreCase(a.name))))
    if (usable.isEmpty || partitionSchema.isEmpty) partitions
    else {
      val bound = Predicate.create(usable.reduce(And).transform {
        case a: AttributeReference =>
          val i = partitionSchema.fields
            .indexWhere(_.name.equalsIgnoreCase(a.name))
          BoundReference(i, partitionSchema.fields(i).dataType,
            nullable = true)
      })
      bound.initialize(0)
      partitions.filter(p => bound.eval(p.values))
    }
  }

  override def inputFiles: Array[String] =
    files.map { case (rel, _) => new Path(basePath, rel).toString }.toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = files.map(_._2).sum
}
