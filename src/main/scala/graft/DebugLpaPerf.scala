package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost attribution for q_label_prop (r9 verdict #5: 6.55 s driver,
  * third-slowest gate): split edge build / round count / checkpoint
  * cadence on the exact gate graph. Run one mode per fresh JVM
  * (SPARK_GRAFT_LPA_MODE = edges | iters1..iters4 | ck1 | ck2 | all):
  * in-JVM sequences under-report later stages through shuffle + JIT
  * reuse (the DebugSpanPerf lesson).
  */
object DebugLpaPerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = sys.env.getOrElse("SPARK_GRAFT_LPA_MODE", "all")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def pairs(): DataFrame = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2L).as("src"),
          (col("l_suppkey") * 2L + 1L).as("dst"))
        .distinct()
    }
    def run(iters: Int, ckEvery: Int): Unit =
      force(graft.operators.Graph.labelPropagation(
        pairs(), "src", "dst", iters = iters, checkpointEvery = ckEvery)
        .select(col("node").as("node_id"), col("label")))
    mode match {
      case "edges" =>
        // the edge build alone: distinct customer–part pairs,
        // symmetrized — what iters=0 pays before any vote
        time("edges_only")(run(0, 4))
      case m if m.startsWith("iters") =>
        val k = m.stripPrefix("iters").toInt
        time(s"lpa_iters$k")(run(k, 4))
      case "ck1" => time("lpa_iters4_ck1")(run(4, 1))
      case "ck2" => time("lpa_iters4_ck2")(run(4, 2))
      case m if m.startsWith("prck") =>
        // the q_pagerank gate body at the given checkpoint cadence
        val ck = m.stripPrefix("prck").toInt
        time(s"pagerank_ck$ck")(force(graft.operators.Graph.pageRankFixedPoint(
          pairs(), "src", "dst", iters = 5, checkpointEvery = ck)
          .select(col("node").as("node_id"), col("rank_fp"))))
      case "all" =>
        time("edges_only")(run(0, 4))
        (1 to 4).foreach(k => time(s"lpa_iters$k")(run(k, 4)))
        time("lpa_iters4_ck2")(run(4, 2))
        time("lpa_iters4_ck1")(run(4, 1))
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
