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
    // the scale-default layout (12 independent bits per band) finds it
    // too — a near-identical pair collides in some band at any width
    val wide = Similarity.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.95, bits = 96, bands = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(wide.contains((0L, 1000L)))
  }

  test("multi-probe LSH: superset of the plain candidates, strictly more recall on tight bands") {
    // 2 bands × 16 bits: tight enough that some true moderate-cosine
    // pair differs by exactly one plane in every band and the plain
    // join misses it — multi-probe must recover some of those while
    // never losing a plain pair (probing only ADDS buckets)
    def pairs(mp: Boolean): Set[(Long, Long)] =
      Similarity.cosineNearDups(vecs, "vec_id", "embedding",
        threshold = 0.8, bits = 32, bands = 2, multiProbe = mp)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val plain = pairs(mp = false)
    val probed = pairs(mp = true)
    assert(plain.subsetOf(probed), "multi-probe lost a plain pair")
    assert(probed.size > plain.size,
      s"expected extra 1-bit-recovered pairs, got ${plain.size} -> ${probed.size}")
    // the planted near-identical pair survives both modes
    assert(plain.contains((0L, 1000L)) && probed.contains((0L, 1000L)))
  }

  test("seeded hyperplane signatures are independent across bands") {
    val sigs = vecs.select(
      Similarity.hyperplaneSignature(col("embedding"), 16).as("s0"),
      Similarity.hyperplaneSignature(col("embedding"), 16, seed = 0L).as("s0b"),
      Similarity.hyperplaneSignature(col("embedding"), 16, seed = 1L).as("s1"),
      Similarity.hyperplaneSignature(col("embedding"), 16, seed = 2L).as("s2"))
      .collect()
    // seed 0 is the default (original plane set)
    assert(sigs.forall(r => r.getLong(0) == r.getLong(1)))
    // different seeds draw different plane sets: across 1001 vectors the
    // 16-bit signatures must not be identical wholesale
    assert(sigs.exists(r => r.getLong(0) != r.getLong(2)))
    assert(sigs.exists(r => r.getLong(2) != r.getLong(3)))
  }

  test("cosineNearDupsAuto sizes bands to the corpus and still finds the planted dup") {
    // 1001 vectors → bandBits = ceil(log2(1001/16)) = 6; the planted
    // near-identical pair collides in some band at any corpus-sized
    // layout (collision prob per plane ≈ 1 at cosine ≈ 1)
    val pairs = Similarity.cosineNearDupsAuto(vecs, "vec_id", "embedding",
      threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((0L, 1000L)))
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupsAuto(vecs, "vec_id", "embedding", threshold = 1.0)
    }
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupsAuto(vecs, "vec_id", "embedding", recall = 1.0)
    }
  }

  test("cosineNearDups maxBucketSize drops degenerate buckets, never blows up") {
    // 40 exact copies of one vector: every band has one 40-occupancy
    // bucket. Over the cap the bucket leaves candidate generation
    // (documented recall loss on a pathological spike); under it the
    // full 40·39/2 pair set is verified
    val dim = 8
    val spike = (0 until 40).map(i =>
      (i.toLong, Seq.fill(dim)(0.5f))).toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDups(spike, "vec_id", "embedding",
      threshold = 0.95, bits = 96, bands = 8, maxBucketSize = 1000)
    assert(uncapped.count() == 40L * 39 / 2)
    val capped = Similarity.cosineNearDups(spike, "vec_id", "embedding",
      threshold = 0.95, bits = 96, bands = 8, maxBucketSize = 10)
    assert(capped.count() == 0)
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDups(spike, "vec_id", "embedding",
        threshold = 0.95, bits = 96, bands = 7)
    }
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

  test("semanticDedup keeps the lowest id per duplicate group") {
    // exact copies of vec 0 at ids 2000/2001 plus the planted near-dup
    // at 1000: all four share a cluster (identical/near-identical
    // vectors), so the group survivor is id 0 alone
    val v0 = vecs.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val withCopies = vecs.unionByName(
      Seq((2000L, v0), (2001L, v0)).toDF("vec_id", "embedding"))
    val survivors = Similarity.semanticDedup(withCopies, "vec_id", "embedding",
      nClusters = 3, threshold = 0.99, maxClusterSize = Int.MaxValue)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(survivors.contains(0L))
    assert(!survivors.contains(2000L) && !survivors.contains(2001L))
    // the 0.99 threshold spares the ~0.3-noise cluster members
    assert(survivors.size >= 85,
      s"only ${survivors.size} survivors — threshold cut too deep")
    // survivors + losers partition the input
    assert(survivors.subsetOf(
      withCopies.collect().map(_.getAs[Long]("vec_id")).toSet))
  }

  test("semanticDedup keep policies pick distinct group survivors") {
    def rot(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // iters = 0 pins the centroids to the two lowest-id seeds exactly:
    // cluster 1 anchored at 0° holds {0°, 0°, 0°, 3°, 6°} (all pairwise
    // cosines ≥ cos 6° ≈ 0.9945 ≥ 0.994 → one duplicate group), cluster
    // 2 anchored at 90° holds {90°, 88°}. Centrality strictly orders
    // 0° > 3° > 6° against the (1, 0) centroid.
    val vs = Seq(
      0L -> rot(0), 1L -> rot(90), 2L -> rot(0), 3L -> rot(0),
      20L -> rot(3), 21L -> rot(6), 30L -> rot(88)
    ).toDF("vec_id", "embedding")
    def surv(keep: String) =
      Similarity.semanticDedup(vs, "vec_id", "embedding", nClusters = 2,
        threshold = 0.994, iters = 0, maxClusterSize = Int.MaxValue,
        keep = keep)
        .collect().map(_.getAs[Long]("id")).toSet
    assert(surv("minId") == Set(0L, 1L))
    // exact-copy anchors tie at centrality 1.0 → min id wins
    assert(surv("mostCentral") == Set(0L, 1L))
    // the SemDeDup rule keeps each group's most atypical member
    assert(surv("leastCentral") == Set(21L, 30L))
    intercept[IllegalArgumentException] {
      Similarity.semanticDedup(vs, "vec_id", "embedding", nClusters = 2,
        keep = "best")
    }
  }

  test("semanticDedup maxClusterSize excludes over-cap clusters loudly-by-contract") {
    // 30 exact copies in one cluster: under the cap they dedup to one
    // survivor; over the cap the cluster leaves pair generation and all
    // copies survive (documented recall loss, never a quadratic)
    val spike = (0 until 30).map(i => (i.toLong, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val deduped = Similarity.semanticDedup(spike, "vec_id", "embedding",
      nClusters = 2, threshold = 0.99, maxClusterSize = 100)
    assert(deduped.count() == 1)
    val capped = Similarity.semanticDedup(spike, "vec_id", "embedding",
      nClusters = 2, threshold = 0.99, maxClusterSize = 10)
    assert(capped.count() == 30)
    intercept[IllegalArgumentException] {
      Similarity.semanticDedup(spike, "vec_id", "embedding",
        nClusters = 2, threshold = 1.5)
    }
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

  // ── product quantization ──

  private lazy val normed = vecs.select(col("vec_id"),
    Similarity.l2Normalize(col("embedding")).as("nv"))

  test("pqEncode emits m codes in 1..k, deterministically") {
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    assert(cb.m == 4 && cb.k == 8 && cb.subDim == 4)
    val codes = Similarity.pqEncode(normed, "nv", cb)
      .select(col("vec_id"), col("pq_codes"))
      .collect().map(r => r.getAs[Long](0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.size == 4 && c.forall(x => x >= 1 && x <= 8)))
    // deterministic: a second train+encode pass is identical
    val cb2 = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    assert(cb.flat.sameElements(cb2.flat))
    // the planted near-duplicate of vec 0 lands on the same codes
    assert(codes(0L) == codes(1000L))
  }

  test("PQ codebook round-trips through its persistence DataFrame") {
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 1)
    val back = Similarity.pqCodebookFromDF(cb.toDF(spark))
    assert(back.m == cb.m && back.k == cb.k && back.subDim == cb.subDim)
    assert(back.flat.sameElements(cb.flat))
  }

  test("pqSearchRerank ranks the planted duplicate first and recalls brute force") {
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    val codes = Similarity.pqEncode(normed, "nv", cb)
      .select(col("vec_id"), col("pq_codes"))
    val probes = normed.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("probe_id"), col("nv").as("probe_vec"))
    val pq = Similarity.pqSearchRerank(codes, "vec_id", "pq_codes",
      normed, "vec_id", "nv", probes, "probe_id", "probe_vec",
      cb, k = 10, shortlist = 30).collect()
    // planted duplicate of vec 0 is its rank-1 neighbour
    assert(pq.exists(r => r.getAs[Long]("probe_id") == 0L &&
      r.getAs[Long]("neighbor_id") == 1000L && r.getAs[Int]("rank") == 1))
    val bf = Similarity.bruteForceTopK(normed, "vec_id", "nv",
      probes, "probe_id", "probe_vec", k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = pq.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.7, s"PQ recall $recall < 0.7")
  }

  test("pqSearch ADC dot tracks the exact dot on quantized data") {
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    val codes = Similarity.pqEncode(normed, "nv", cb)
      .select(col("vec_id"), col("pq_codes"))
    val probes = normed.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("nv").as("probe_vec"))
    val adc = Similarity.pqSearch(codes, "vec_id", "pq_codes",
      probes, "probe_id", "probe_vec", cb, k = 91).collect()
    // unit vectors: every ADC dot must stay within the reconstruction
    // error band of a legal cosine
    assert(adc.forall(r => math.abs(r.getAs[Double]("adc_dot")) <= 1.5))
    // the planted duplicate (cosine ≈ 1 to the probe) lands in the ADC
    // top-10 of 91 — quantization can rank a few same-cluster vectors
    // whose RECONSTRUCTIONS dot higher above it, which is exactly the
    // error band rerank exists to fix, but it cannot push a true
    // duplicate out of the shortlist
    val dup = adc.find(_.getAs[Long]("neighbor_id") == 1000L).get
    assert(dup.getAs[Int]("rank") <= 10,
      s"planted dup ADC rank ${dup.getAs[Int]("rank")} > 10")
    assert(dup.getAs[Double]("adc_dot") > 0.9)
  }

  test("ivfPqSearch composes coarse pruning with ADC + rerank and recalls brute force") {
    val (assign, cents) = Similarity.ivfIndex(normed, "vec_id", "nv",
      nCentroids = 3, iters = 2)
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    val coded = Similarity.pqEncode(assign, "v", cb)
      .select(col("id"), col("centroid_id"), col("pq_codes"))
    val probes = normed.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("probe_id"), col("nv").as("probe_vec"))
    val got = Similarity.ivfPqSearch(coded, "id", "pq_codes", cents,
      normed, "vec_id", "nv", probes, "probe_id", "probe_vec",
      cb, k = 10, nprobe = 2, shortlist = 30).collect()
    // per-probe contract: exactly k results, dup of vec 0 at rank 1
    assert(got.groupBy(_.getAs[Long]("probe_id")).forall(_._2.length == 10))
    assert(got.exists(r => r.getAs[Long]("probe_id") == 0L &&
      r.getAs[Long]("neighbor_id") == 1000L && r.getAs[Int]("rank") == 1))
    val bf = Similarity.bruteForceTopK(normed, "vec_id", "nv",
      probes, "probe_id", "probe_vec", k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val gotSet = got.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf intersect gotSet).size.toDouble / bf.size
    assert(recall >= 0.7, s"IVF-PQ recall $recall < 0.7")
  }

  test("packed PQ codes: one long per row, search results identical to the array form") {
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    val arr = Similarity.pqEncode(normed, "nv", cb)
      .select(col("vec_id"), col("pq_codes"))
    val packed = Similarity.pqEncodePacked(normed, "nv", cb)
      .select(col("vec_id"), col("pq_code"))
    // pack/unpack agreement: nibble mi of the word is code(mi) - 1
    val joined = arr.join(packed, "vec_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val codes = r.getSeq[Int](1)
      val word = r.getLong(2)
      codes.zipWithIndex.foreach { case (c, mi) =>
        assert(((word >>> (4 * mi)) & 0xF) == c - 1, s"vec ${r.getLong(0)} sub $mi")
      }
    }
    val probes = normed.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("probe_id"), col("nv").as("probe_vec"))
    val viaArr = Similarity.pqSearch(arr, "vec_id", "pq_codes",
      probes, "probe_id", "probe_vec", cb, k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dot"))).toMap
    val viaPacked = Similarity.pqSearch(packed, "vec_id", "pq_code",
      probes, "probe_id", "probe_vec", cb, k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dot"))).toMap
    assert(viaArr == viaPacked)
  }

  test("nearestByAdc: top-1 per probe, self excluded, smaller-id tie-break") {
    val cb = Similarity.pqTrain(normed, "vec_id", "nv", m = 4, k = 8, iters = 2)
    val codes = Similarity.pqEncodePacked(normed, "nv", cb)
      .select(col("vec_id"), col("pq_code"))
    val probes = normed.filter(col("vec_id").isin(0L, 1000L))
      .select(col("vec_id").as("pid"), col("nv").as("pv"))
    val r = graft.streaming.VectorStreams.nearestByAdc(
      probes, "pid", "pv", codes, "vec_id", "pq_code", cb).collect()
    assert(r.length == 2)
    // vec 0 and its planted dup share codes, so each probe's own twin
    // ties the max ADC with every same-code vector; the deterministic
    // winner is the smallest qualifying id (vec 0 itself for probe
    // 1000); every probe scores exactly corpus − 1 candidates
    assert(r.forall(_.getAs[Long]("n_scored") == 90L))
    val byProbe = r.map(x => x.getAs[Long]("probe_id") -> x.getAs[Long]("neighbor_id")).toMap
    assert(byProbe(1000L) == 0L || byProbe(1000L) < 1000L)
    // determinism: a second evaluation returns the identical relation
    val r2 = graft.streaming.VectorStreams.nearestByAdc(
      probes, "pid", "pv", codes, "vec_id", "pq_code", cb).collect()
    assert(r.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }

  test("knnGraph: planted dup mutual rank-1, degree ≤ k, high recall vs brute force") {
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding",
      k = 5, nCentroids = 3, iters = 2, nprobe = 2,
      maxListSize = Int.MaxValue)
      .collect()
    val bySrc = g.groupBy(_.getAs[Long]("id"))
    assert(bySrc.forall(_._2.length <= 5))
    // ranks are 1..deg and cosine non-increasing in rank
    bySrc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the planted near-duplicate pair is mutual rank-1
    def rank1(src: Long): Long = g.find(r =>
      r.getAs[Long]("id") == src && r.getAs[Int]("rank") == 1)
      .get.getAs[Long]("neighbor_id")
    assert(rank1(0L) == 1000L && rank1(1000L) == 0L)
    // recall of the true top-5 relation (clustered data, 2-probe lists)
    val probes = vecs.select(col("vec_id").as("probe_id"),
      col("embedding").as("probe_vec"))
    val bf = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 5)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = g.map(r => (r.getAs[Long]("id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.8, s"knn recall $recall < 0.8")
  }

  test("nearestCentroids multi-assignment agrees with the single-argmax kernel") {
    val cents = IndexedSeq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
    val flat = cents.flatten.toArray
    val r = Seq((1L, Seq(0.9f, 0.4f, 0.1f, 0f))).toDF("id", "v")
      .select(
        graft.plans.native.nearestCentroid(col("v"), flat, 3).as("one"),
        graft.plans.native.nearestCentroids(col("v"), flat, 3, 2).as("two"))
      .head()
    assert(r.getSeq[Int](1).head == r.getInt(0)) // best-first
    assert(r.getSeq[Int](1) == Seq(1, 2))        // then second-best
  }

  test("persisted PQ index: build, append a batch, search finds the appended copy") {
    val path = graft.Scratch.path("pq_index_spec")
    val cb = Similarity.writePqIndex(vecs, "vec_id", "embedding", path,
      m = 4, k = 8, iters = 2)
    // appended batch encodes with the STORED codebook
    val batch = vecs.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val cb2 = Similarity.appendToPqIndex(spark, path, batch, "vec_id", "embedding")
    assert(cb2.flat.sameElements(cb.flat)) // append never retrains
    val codes = graft.operators.Store.read(spark, s"$path/codes")
    assert(codes.count() == vecs.count() + 1)
    val store = vecs.select(col("vec_id"), col("embedding")).unionByName(batch)
    val probes = vecs.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val res = Similarity.searchPqIndex(spark, path, store,
      "vec_id", "embedding", probes, "probe_id", "probe_vec",
      k = 1, shortlist = 20).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Long]("neighbor_id") == 5007L) // the appended copy
  }

  test("mineHardNegatives excludes positives and ranks the planted near-dup hardest") {
    // positives: (query 0 → its planted near-dup 1000); the hardest
    // remaining negative must then be a same-cluster organic vector,
    // and 1000 must not leak
    val queries = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val positives = Seq((0L, 1000L)).toDF("q", "p")
    val res = Similarity.mineHardNegatives(vecs, "vec_id", "embedding",
      queries, "qid", "qv", positives, "q", "p", n = 5, k = 10).collect()
    assert(res.length == 5)
    assert(res.forall(_.getAs[Long]("neighbor_id") != 1000L))
    assert(res.forall(_.getAs[Long]("neighbor_id") != 0L))
    // without the positive label, 1000 IS the hardest negative
    val res2 = Similarity.mineHardNegatives(vecs, "vec_id", "embedding",
      queries, "qid", "qv", Seq.empty[(Long, Long)].toDF("q", "p"),
      "q", "p", n = 5, k = 10).collect()
    assert(res2.find(_.getAs[Int]("rank") == 1).get
      .getAs[Long]("neighbor_id") == 1000L)
    // misconfigured depth fails loudly
    assertThrows[IllegalArgumentException] {
      Similarity.mineHardNegatives(vecs, "vec_id", "embedding",
        queries, "qid", "qv", positives, "q", "p", n = 10, k = 5)
    }
  }

  test("pqTrain rejects an m that does not divide the dimension") {
    assertThrows[IllegalArgumentException] {
      Similarity.pqTrain(normed, "vec_id", "nv", m = 5, k = 4, iters = 1)
    }
  }

  test("pqTrain pads seeds when the corpus has fewer vectors than k") {
    val tiny = normed.filter(col("vec_id") < 3L)
    val cb = Similarity.pqTrain(tiny, "vec_id", "nv", m = 2, k = 8, iters = 1)
    assert(cb.k == 8)
    val codes = Similarity.pqEncode(tiny, "nv", cb).select(col("pq_codes")).collect()
    assert(codes.forall(_.getSeq[Int](0).forall(c => c >= 1 && c <= 8)))
  }

  test("randomProject preserves pairwise distances within the JL band (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val dim = 48
    val rows = (0L until 40L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "v")
    val proj = df.select(col("vec_id"),
      Similarity.randomProject(col("v"), outDim = 24, seed = 3L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val ratios = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
    } yield d2(proj(i), proj(j)) / d2(orig(i), orig(j))
    // deterministic seeded draw: the squared-distance ratio has std
    // ≈ √(2/24) ≈ 0.29 per pair, so over 780 pairs the extremes reach
    // several σ — the sharp guarantees are on the MEAN and the bulk
    assert(ratios.forall(r => r > 0.0 && r < 6.0),
      s"worst ratios: ${ratios.min} / ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean ratio $mean drifted from 1")
    val inBand = ratios.count(r => r > 0.5 && r < 1.5).toDouble / ratios.size
    assert(inBand > 0.85, s"only ${inBand * 100}%% of pairs within ±50%")
    // projection is deterministic: same seed → identical bits
    val again = df.select(Similarity.randomProject(col("v"), 24, 3L).as("p"))
      .collect().map(_.getSeq[Double](0)).flatten.toSeq
    val third = df.select(Similarity.randomProject(col("v"), 24, 3L).as("p"))
      .collect().map(_.getSeq[Double](0)).flatten.toSeq
    assert(again == third)
  }

  test("openIvfPqIndex: a handle serves repeated searches identically to per-query opens") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_h_").toString
    def axis(i: Int, dim: Int): Seq[Float] =
      Seq.tabulate(dim)(j => if (j == i % dim) 1f else 0.01f * ((i + j) % 3))
    val corpus = (0 until 16).map(i => (i.toLong, axis(i, 8)))
      .toDF("vec_id", "embedding")
    Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", s"$dir/idx",
      nlist = 4, m = 4, k = 4, iters = 2)
    val h = Similarity.openIvfPqIndex(spark, s"$dir/idx")
    def probesOf(ids: Seq[Long]) = corpus.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    // two DIFFERENT probe batches through ONE handle, each equal to
    // the one-shot path form
    Seq(Seq(0L, 1L), Seq(2L, 3L, 4L)).foreach { ids =>
      val viaHandle = Similarity.searchIvfPqIndex(h, corpus,
        "vec_id", "embedding", probesOf(ids), "probe_id", "pv",
        k = 2, nprobe = 2, shortlist = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val viaPath = Similarity.searchIvfPqIndex(spark, s"$dir/idx", corpus,
        "vec_id", "embedding", probesOf(ids), "probe_id", "pv",
        k = 2, nprobe = 2, shortlist = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaHandle == viaPath && viaHandle.nonEmpty)
    }
    // snapshot semantics: rows appended AFTER the open are served only
    // by a RE-OPENED handle (the documented one-maintenance-cycle view)
    val twin = Seq((100L, axis(0, 8))).toDF("vec_id", "embedding")
    Similarity.appendToIvfPqIndex(spark, s"$dir/idx", twin,
      "vec_id", "embedding")
    val all = corpus.unionByName(twin)
    val before = Similarity.searchIvfPqIndex(h, all,
      "vec_id", "embedding", probesOf(Seq(0L)), "probe_id", "pv",
      k = 1, nprobe = 2, shortlist = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!before.contains(100L), "a handle is a snapshot of its open")
    val h2 = Similarity.openIvfPqIndex(spark, s"$dir/idx")
    val after = Similarity.searchIvfPqIndex(h2, all,
      "vec_id", "embedding", probesOf(Seq(0L)), "probe_id", "pv",
      k = 1, nprobe = 2, shortlist = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(after == Set(100L), "re-open serves the appended exact twin")
  }
}
