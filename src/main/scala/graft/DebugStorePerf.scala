package graft

import graft.operators.Dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the signature-store gate phases (not part of
  * the contract): times build / append / probe / retire / probe
  * separately so a store-family bench regression can be attributed to
  * the write path vs the probe path. */
object DebugStorePerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val stages = j.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != ' ')}(${si.numTasks})").mkString("+")
          jobs.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .orElse(Option(j.properties.getProperty("callSite.short")))
              .getOrElse("?") + s" [$stages]"))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobs.remove(j.jobId)
          if (st != null)
            done.add(((System.nanoTime() - st._1) / 1e9, st._2))
        }
      })
    def tm[A](name: String)(body: => A): A = {
      done.clear()
      val t0 = System.nanoTime()
      val r = body
      println(f"[dbg] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val it = done.iterator()
      var i = 0
      while (it.hasNext) {
        val (sec, desc) = it.next()
        println(f"[dbg]    job#$i%-2d ${sec}%.2f s  ${desc.take(90)}")
        i += 1
      }
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val path = "/tmp/graft_dbg_store"
    new java.io.File(path).delete()
    val _ = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    tm("build writeSignatureTable") {
      Dedup.writeSignatureTable(
        docs.select(col("doc_id"), col("text")), "doc_id", "text", path)
    }
    def freshAt(offset: Long) = docs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(lit("fresh document u"), col("doc_id"),
          lit(" payload p"), col("doc_id"),
          lit(" q"), col("doc_id")).as("text"))
    tm("append") {
      Dedup.appendToSignatureTable(spark, path, freshAt(300000L),
        "doc_id", "text")
    }
    val copies = freshAt(500000L)
    tm("probe#1 nearDedupIncremental") {
      Dedup.nearDedupIncremental(spark, path, copies, "doc_id", "text",
        threshold = 0.7).count()
    }
    val retired = docs
      .filter(col("doc_id") % 10 === 1 && col("doc_id") % 3 === 1)
      .select((col("doc_id") + 300000L).as("doc_id"))
    tm("retire (2 rewrites)") {
      Dedup.retireFromSignatureTable(spark, path, retired, "doc_id")
    }
    tm("probe#2 nearDedupIncremental") {
      Dedup.nearDedupIncremental(spark, path, copies, "doc_id", "text",
        threshold = 0.7).count()
    }
    spark.stop()
  }
}
