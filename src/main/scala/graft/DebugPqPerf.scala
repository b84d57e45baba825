package graft

import graft.operators.Similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the PQ retrieval stages (not part of the
  * contract): where do ann_pq's seconds go at 10×? */
object DebugPqPerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_10x")
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
      println(f"[pq] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val normed = emb.select(col("vec_id"),
      Similarity.l2Normalize(col("embedding")).as("nv"))
    tm("normalize+count")(normed.count())
    var cb: Similarity.PqCodebook = null
    tm("train m=8 k=16 iters=2") {
      cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 8, k = 16, iters = 2)
      1L
    }
    val codes = Similarity.pqEncode(normed, "nv", cb)
      .select(col("vec_id"), col("pq_codes"))
    tm("encode")(codes.count())
    val codesP = codes.persist()
    tm("encode persisted")(codesP.count())
    val probes = normed.orderBy(col("vec_id")).limit(5)
      .select(col("vec_id").as("probe_id"), col("nv").as("probe_vec"))
    tm("adc search k=50 (recomputed codes)") {
      Similarity.pqSearch(codes, "vec_id", "pq_codes",
        probes, "probe_id", "probe_vec", cb, 50).count()
    }
    tm("adc search k=50 (persisted codes)") {
      Similarity.pqSearch(codesP, "vec_id", "pq_codes",
        probes, "probe_id", "probe_vec", cb, 50).count()
    }
    tm("rerank e2e (persisted codes)") {
      Similarity.pqSearchRerank(codesP, "vec_id", "pq_codes",
        normed, "vec_id", "nv", probes, "probe_id", "probe_vec",
        cb, k = 10, shortlist = 50).count()
    }
    spark.stop()
  }
}
