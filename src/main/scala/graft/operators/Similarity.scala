package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, hyperplane-LSH
  * near-dup pairs, and an IVF (inverted-file) index as the scale path.
  *
  * All vector math is `zip_with`/`aggregate` column algebra — codegen'd,
  * no UDFs, no driver-side loops. Probes and centroids are the only
  * broadcast-small sides; the big embedding table is never collected.
  */
object Similarity {

  /** Σ aᵢbᵢ as double (declarative HOF form — kept for reference/
    * comparison; the hot paths use the native kernel). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (s, x) => s + x)

  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0d), (s, x) => s + x.cast("double") * x.cast("double")))

  /** Cosine similarity — native codegen'd expression (one fused pass
    * over both arrays, graft.plans.CosineSim). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.native.cosineSim(a, b)

  /** L2-normalize a vector to unit length (zero vectors pass through
    * unchanged). After normalization, cosine reduces to a dot product —
    * normalize once at ingest, search many times. */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n > 0d, transform(v, x => x.cast("double") / n)).otherwise(
      transform(v, x => x.cast("double")))
  }

  /** Symmetric int8 quantization for embedding storage: scale by
    * 127/max|x| and round — an 8× storage/shuffle reduction with the
    * scale kept alongside for dequantization. Returns
    * struct(codes: array<int> in [-127,127], scale: double). */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = aggregate(v, lit(0d), (m, x) => greatest(m, abs(x.cast("double"))))
    val scale = when(maxAbs > 0d, maxAbs / lit(127d)).otherwise(lit(1d))
    struct(
      transform(v, x => round(x.cast("double") / scale).cast("int")).as("codes"),
      scale.as("scale"))
  }

  /** Dequantize int8 codes back to doubles. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Exact brute-force top-k: every probe against every vector, ranked
    * by cosine (desc, id asc tie-break). Probes must be small (they are
    * broadcast); the data side streams. O(N·P·dim) — the correctness
    * baseline the approximate paths are judged against.
    *
    * @param data   (idCol, vecCol)
    * @param probes (probeIdCol, probeVecCol), small
    */
  def bruteForceTopK(
      data: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    val scored = data.crossJoin(broadcast(probes))
      .withColumn("cosine", cosine(col(vecCol), col(probeVecCol)))
      .filter(col(probeIdCol) =!= col(idCol))
    val w = Window.partitionBy(col(probeIdCol))
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(probeIdCol).as("probe_id"), col(idCol).as("neighbor_id"),
        col("rank"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * a symmetric ±{1..} value derived from xxhash64 — no RNG, so plans
    * are reproducible and resumable (no Math.random in a distributed
    * plan). Returns `bits` sign-bits packed as a long. */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    graft.plans.native.hyperplaneSig(vec, bits)

  /** Embedding near-duplicate pairs: hyperplane-LSH buckets propose,
    * exact cosine disposes. Bands of the signature are the shuffle key;
    * only bucket-colliding vectors ever pair up. */
  def cosineNearDups(
      data: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 16, bands: Int = 4): DataFrame = {
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val sigd = data.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(col(vecCol), bits).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate generation over (id, bucket) ONLY — the wide vectors
    // stay out of the bucket self-join and are fetched once per
    // surviving candidate pair (at 100 TB the vectors are the payload;
    // shuffling them per-band would multiply the shuffle by `bands`).
    val banded = sigd.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask)).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val candidates = banded.alias("a")
      .join(banded.alias("b"), Seq("band", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val vecs = sigd.select(col("id"), col("v"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** IVF index: k-means-lite centroids (deterministic init = lowest
    * ids, `iters` Lloyd rounds), every vector assigned to its nearest
    * centroid. At scale the assignment table would be written bucketed
    * by centroid id so probes only read their shortlist partitions.
    *
    * Centroids live on the DRIVER between rounds (k × dim doubles —
    * tiny by construction, the standard k-means layout, same as Spark
    * MLlib): each Lloyd round is then ONE distributed pass where the
    * nearest-centroid argmax is a broadcast-literal codegen'd
    * expression over the vectors — no per-round shuffle of the (wide)
    * vector table, no lineage growth across rounds. Only the k × dim
    * per-dimension means ever travel to the driver.
    *
    * @return (assignments: id, vec, centroid_id; centroids: centroid_id, cvec)
    */
  def ivfIndex(
      data: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    require(nCentroids >= 2, "nCentroids must be >= 2")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}
    val spark = data.sparkSession
    val d = data.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic seed: the nCentroids lowest-id vectors
    var centroids: IndexedSeq[(Int, Seq[Double])] =
      d.orderBy(col("id")).limit(nCentroids).collect().toIndexedSeq
        .zipWithIndex.map { case (r, i) => (i + 1, r.getSeq[Double](1)) }

    // nearest centroid id: max cosine, ties → smallest id, evaluated as
    // a single whole-stage-codegen projection against literal centroids
    def nearest(cents: IndexedSeq[(Int, Seq[Double])]): Column = {
      val scored = cents.map { case (cid, cv) =>
        struct(cosine(col("v"), typedLit(cv)).as("c"), lit(-cid).as("nid"))
      }
      // greatest() needs >= 2 args; a single seed centroid (input had
      // fewer rows than nCentroids) assigns everything to it
      val best = if (scored.size == 1) scored.head else greatest(scored: _*)
      -best.getField("nid")
    }
    def assign(cents: IndexedSeq[(Int, Seq[Double])]): DataFrame =
      // empty input → no seed centroids; emit the (empty) frame with
      // the contract schema instead of calling nearest() on no args
      if (cents.isEmpty) d.withColumn("centroid_id", lit(0))
      else d.withColumn("centroid_id", nearest(cents))

    for (_ <- 0 until iters) {
      // per-dimension means: scalar-only shuffle (centroid_id, pos, x),
      // k × dim rows back to the driver; empty centroids keep their
      // previous position (standard k-means edge case)
      val means = assign(centroids)
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val byCentroid = means.groupBy(_.getAs[Int]("centroid_id")).map {
        case (cid, rows) =>
          cid -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toSeq
      }
      centroids = centroids.map { case (cid, old) =>
        (cid, byCentroid.getOrElse(cid, old))
      }
    }
    val centDf = spark.createDataFrame(
      java.util.Arrays.asList(centroids.map { case (cid, cv) => Row(cid, cv) }: _*),
      StructType(Seq(StructField("centroid_id", IntegerType, nullable = false),
        StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false))))
    (assign(centroids), centDf)
  }

  /** IVF search: probe → `nprobe` nearest centroids → exact cosine only
    * within those inverted lists → top-k. The 100 TB path: work is
    * proportional to the probed lists, not the corpus. */
  def ivfSearch(
      assignments: DataFrame, centroids: DataFrame,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val p = probes.select(col(probeIdCol).as("probe_id"),
      transform(col(probeVecCol), x => x.cast("double")).as("pv"))
    val pc = p.crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("pv"), col("cvec")))
    val wc = Window.partitionBy(col("probe_id")).orderBy(col("ccos").desc, col("centroid_id").asc)
    val shortlist = pc.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("probe_id"), col("pv"), col("centroid_id"))
    val scored = shortlist.join(assignments, "centroid_id")
      .filter(col("probe_id") =!= col("id"))
      .withColumn("cosine", cosine(col("pv"), col("v")))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("id").as("neighbor_id"), col("rank"), col("cosine"))
  }
}
