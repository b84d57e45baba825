package graft

import graft.operators.Dedup
import graft.functions.TextFunctions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (not part of the contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[dbg] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val df = spark.read.parquet(s"$dir/documents.parquet")
    tm("shingles")(df.select(Dedup.shingleHashes(col("text"), 3).as("sh")).agg(sum(size(col("sh")))).head().getLong(0))
    val docs = df.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 64))
      .persist()
    tm("signatures")(docs.count())
    val buckets = docs.select(col("id"), col("sig"),
      explode(Dedup.bandBuckets(col("sig"), 16, 4)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    tm("buckets")(buckets.count())
    tm("bucket histogram")(buckets.groupBy("band", "bucket").count()
      .agg(max(col("count"))).head().getLong(0))
    val a = buckets.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
    tm("raw candidates")(cand.count())
    tm("distinct candidates")(cand.select("id_a", "id_b").distinct().count())
    tm("full op")(Dedup.minHashNearDups(df, "doc_id", "text").count())
    // simhash candidate volume
    val sh = df.select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("sig")).persist()
    tm("simhash sigs")(sh.count())
    tm("simhash distinct sigs")(sh.select("sig").distinct().count())
    val sb = sh.select(col("id"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")).persist()
    tm("simhash max bucket")(sb.groupBy("band","bucket").count().agg(max(col("count"))).head().getLong(0))
    tm("simhash raw candidates")(sb.alias("a").join(sb.alias("b"), Seq("band","bucket")).filter(col("a.id") < col("b.id")).count())
    spark.stop()
  }
}
