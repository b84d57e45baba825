package graft

import graft.operators.Similarity

import org.apache.spark.sql.functions._

/** Embedding similarity: brute-force ground truth, LSH near-dup with a
  * planted duplicate, IVF recall against brute force. */
class SimilaritySpec extends GraftSpec {

  import spark.implicits._

  // deterministic synthetic vectors: 3 tight clusters + 1 planted near-dup
  private lazy val vecs = {
    val rng = new scala.util.Random(11)
    val base = (0 until 3).map(_ => Array.fill(16)(rng.nextGaussian().toFloat))
    val rows = (0 until 90).map { i =>
      val c = base(i % 3)
      val v = c.map(x => x + (rng.nextGaussian() * 0.3).toFloat)
      (i.toLong, v.toSeq)
    }
    // vec 1000 ≈ vec 0 (planted near-duplicate, cosine ≈ 1)
    val v0 = rows.head._2.toArray
    val planted = (1000L, v0.map(x => x + 1e-4f).toSeq)
    (rows :+ planted).toDF("vec_id", "embedding")
  }

  test("cosine column matches a driver-side computation") {
    val r = vecs.filter(col("vec_id").isin(0L, 1000L))
      .crossJoin(vecs.filter(col("vec_id") === 0L)
        .select(col("embedding").as("other")))
      .select(Similarity.cosine(col("embedding"), col("other")).as("c"))
      .collect().map(_.getDouble(0))
    assert(r.exists(c => math.abs(c - 1.0) < 1e-9))  // self
    assert(r.forall(c => c > 0.999))                  // planted dup
  }

  test("cosineNearDups finds the planted duplicate at a 0.95 threshold") {
    val pairs = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.95, bits = 16, bands = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((0L, 1000L)))
  }

  test("bruteForceTopK ranks by cosine desc and excludes the probe itself") {
    val probes = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 5).collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("neighbor_id") == 1000L) // planted dup is rank 1
    assert(top.forall(_.getAs[Long]("neighbor_id") != 0L))
    val cosines = top.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse))
  }

  test("l2Normalize yields unit vectors; quantize/dequantize round-trips within 1%") {
    val v = vecs.filter(col("vec_id") === 0L)
    val n = v.select(Similarity.norm(Similarity.l2Normalize(col("embedding"))).as("n"))
      .head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-9)
    val rt = v.select(
      col("embedding"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("deq"))
      .select(Similarity.cosine(col("embedding"), col("deq")).as("c"))
      .head().getDouble(0)
    assert(rt > 0.99, s"dequantized cosine $rt should be ≈1")
  }

  test("IVF search recalls most of the brute-force top-k (clustered data)") {
    val probes = vecs.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val bf = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val (assign, cents) = Similarity.ivfIndex(vecs, "vec_id", "embedding",
      nCentroids = 3, iters = 2)
    val ivf = Similarity.ivfSearch(assign, cents, probes, "probe_id", "probe_vec",
      k = 10, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8")
  }
}
