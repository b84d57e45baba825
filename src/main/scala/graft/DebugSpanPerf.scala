package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage profile of the duplicated-span pipeline (final-HEAD
  * sweep read span_dedup at 57 s / ratio 8 at 10× on the regenerated
  * corpus — find which shuffle carries the cost). */
object DebugSpanPerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_10x")
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
    val k = 8
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    if (sys.env.contains("SPARK_GRAFT_SPAN_COLD")) {
      time("full_spans_cold")(force(graft.operators.Dedup.duplicatedSpans(
        docs, "doc_id", "text", k = 8)))
      time("full_spans_warm")(force(graft.operators.Dedup.duplicatedSpans(
        docs, "doc_id", "text", k = 8)))
      spark.stop()
      return
    }
    // SPARK_GRAFT_SPAN_STAGE: run ONE stage in a fresh JVM (the
    // in-JVM sequence below under-reports later stages through shuffle
    // and JIT reuse — measured 5.3 s for a pipeline whose fresh-JVM
    // cost is 78 s warm)
    sys.env.get("SPARK_GRAFT_SPAN_STAGE").foreach { stage =>
      val toksS = split(col("text"), " ")
      val windowsS = docs.filter(col("text").isNotNull && size(toksS) >= k)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(toksS) - k + 1),
            i => struct(i.cast("long").as("pos"),
              array_join(slice(toksS, i, lit(k)), " ").as("gram")))).as("w"))
        .select(col("doc_id"), col("w.pos").as("pos"), col("w.gram").as("gram"))
      val hotS = windowsS.groupBy(xxhash64(col("gram")).as("wh"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("wh"))
      val survS = windowsS.join(hotS, xxhash64(col("gram")) === col("wh"), "left_semi")
      val statsS = survS.groupBy(col("gram"))
        .agg(count(lit(1)).as("c"),
          min(struct(col("doc_id"), col("pos"))).as("first"))
        .filter(col("c") >= 2).select(col("gram"), col("first"))
      stage match {
        case "scan"   => time("scan")(force(windowsS))
        case "hot"    => time("hot")(force(hotS))
        case "semi"   => time("semi")(force(survS))
        case "stats"  => time("stats")(force(statsS))
        case "ranked" => time("ranked")(force(survS.join(statsS, Seq("gram"))))
        case "counts" =>
          println("windows=" + windowsS.count())
          println("survivors=" + survS.count())
          println("stats=" + statsS.count())
        case "islands" =>
          // the full operator minus the ranked prefix: per-doc
          // gaps-and-islands over the ranked rows
          val dup = survS.join(statsS, Seq("gram"))
            .select(col("doc_id"), col("pos"), (col("pos") + (k - 1)).as("e"))
          val byDoc = org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("pos"))
          val prevMax = max(col("e")).over(byDoc.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
          val islands = dup
            .withColumn("brk",
              when(prevMax.isNull || col("pos") > prevMax + 1, 1).otherwise(0))
            .withColumn("island", sum(col("brk")).over(byDoc))
            .groupBy(col("doc_id"), col("island"))
            .agg(min(col("pos")).as("span_start"), max(col("e")).as("span_end"))
          time("islands")(force(islands))
          islands.explain("formatted")
        case other    => sys.error(s"unknown stage $other")
      }
      spark.stop()
      return
    }
    val toks = split(col("text"), " ")
    val windows = docs.filter(col("text").isNotNull && size(toks) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(toks) - k + 1),
          i => struct(i.cast("long").as("pos"),
            array_join(slice(toks, i, lit(k)), " ").as("gram")))).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.gram").as("gram"))
    time("window_scan")(force(windows))
    val hot = windows
      .groupBy(xxhash64(col("gram")).as("wh"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("wh"))
    time("hot_hash_agg")(force(hot))
    println("hot hashes: " + hot.count() + " of " +
      windows.select(xxhash64(col("gram"))).distinct().count() +
      " distinct / " + windows.count() + " windows")
    val survivors = windows
      .join(hot, xxhash64(col("gram")) === col("wh"), "left_semi")
    time("semi_join")(force(survivors))
    val stats = survivors
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("c") >= 2)
      .select(col("gram"), col("first"))
    time("stats_agg")(force(stats))
    time("ranked_join")(force(survivors.join(stats, Seq("gram"))))
    time("full_spans")(force(graft.operators.Dedup.duplicatedSpans(
      docs, "doc_id", "text", k = 8)))
    survivors.join(stats, Seq("gram")).explain("formatted")
    spark.stop()
  }
}
