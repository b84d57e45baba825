package graft

import graft.operators.{Dedup, Store}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler decomposing a clustered store CREATE into its cost
  * layers vs the flat write it replaced (not part of the contract):
  * input materialization, flat write, clustered write with/without
  * explicit splits — so a build-family bench regression can be priced
  * against what the layout actually buys. */
object DebugWritePerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dbg] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sigs = docs
      .select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tm("sigs materialize (count)")(sigs.count())
    val base = "/tmp/graft_dbg_write"
    val rootP = new org.apache.hadoop.fs.Path(base)
    rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(rootP, true)
    tm("sigs create FLAT (r12 shape)")(
      Store.create(sigs, s"$base/flat"))
    tm("sigs create CLUSTERED id (percentile autoSplits)")(
      Store.create(sigs, s"$base/clustered", clusterBy = Seq("id")))
    val buckets = sigs
      .select(col("id"), explode(Dedup.bandBuckets(col("sig"), 16, 4)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val capped = buckets
      .withColumn("__graft_bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))))
      .filter(col("__graft_bsz") <= 1000)
      .drop("__graft_bsz")
    tm("buckets create FLAT")(
      Store.create(capped, s"$base/bflat"))
    tm("buckets create PARTITIONED+CLUSTERED (hashKeySplits)")(
      Store.create(capped, s"$base/bclustered",
        partitionCols = Seq("band"), clusterBy = Seq("bucket"),
        splits = Some(Store.hashKeySplits(col("bucket"),
          Some((col("band"), 16))))))
    tm("buckets create CLUSTERED no-partition (hashKeySplits)")(
      Store.create(capped, s"$base/bclustered2",
        clusterBy = Seq("bucket"),
        splits = Some(Store.hashKeySplits(col("bucket")))))
    spark.stop()
  }
}
