package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q_ann_rp's wall at the 10× replica: cross-join+cosine
  * compute vs the rank window, and the scan parallelism feeding them.
  * Perf tooling only (the Debug* family). */
object DebugAnnRp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[annrp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    System.err.println(s"[annrp] scan partitions: ${emb.rdd.getNumPartitions}")
    val nonzero = aggregate(col("embedding"), lit(0d),
      (a, x) => a + x.cast("double") * x.cast("double")) > 0d
    val aug = emb.select(col("vec_id"), col("embedding")).unionByName(
      emb.filter(col("vec_id") % 5 === 0 && nonzero)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    val proj = time("project+cache") {
      val p = aug.select(col("vec_id"),
        graft.operators.Similarity.randomProject(
          col("embedding"), outDim = 16, seed = 7L).as("p"))
      p.count(); p
    }
    System.err.println(s"[annrp] proj partitions: ${proj.rdd.getNumPartitions}")
    val probes = proj.filter(col("vec_id") >= 100000L)
      .select(col("vec_id").as("q_id"), col("p").as("qp"))
    System.err.println(s"[annrp] probes: ${probes.count()}")
    val scored = proj.crossJoin(broadcast(probes))
      .withColumn("cosine", graft.operators.Similarity.cosine(col("p"), col("qp")))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("cosine"))
    time("scored.count (cross+cosine, no window)") { scored.count() }
    val repart = args.lift(1).map(_.toInt)
    val base = repart.fold(scored)(n => scored.repartition(n, col("q_id")))
    time("full topk (window)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      base.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 1)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
