package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

class SamplingSpec extends GraftSpec {

  import spark.implicits._

  test("shardAssign: exact hash, dense per-shard positions, partition-stable") {
    val df = (0L until 1000L).toDF("id")
    val out = Sampling.shardAssign(df, "id", nShards = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("shard"),
        r.getAs[Long]("pos")))
    assert(out.length == 1000, "every row assigned")
    // shard matches the documented exact-integer formula
    assert(out.forall { case (id, s, _) =>
      s == ((id % 2147483648L) * 2654435761L % 4294967296L % 8).toInt })
    // positions are dense 0..n-1 within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(0L until rows.length))
    }
    // repartitioning must not change a single assignment
    val again = Sampling.shardAssign(df.repartition(13), "id", nShards = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("shard"),
        r.getAs[Long]("pos"))).toSet
    assert(again == out.toSet, "assignment depends only on ids")
    intercept[IllegalArgumentException](Sampling.shardAssign(df, "id", 0))
  }

  test("deterministicSample: exactly k per group, stable across runs") {
    val a = Sampling.deterministicSample(people, Seq("name"), "id", 3)
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("id"))).toSet
    val b = Sampling.deterministicSample(people.repartition(7), Seq("name"), "id", 3)
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("id"))).toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(a.groupBy(_._1).forall(_._2.size == 3))
    assert(a.size == 30) // 10 names × 3
  }

  test("weightedKeep: rates 0/1 are exact, kept sets nest and are partition-stable") {
    val domains = people.withColumn("dom", col("name"))
    val none = Sampling.weightedKeep(domains, "dom", "id", Map.empty, defaultRate = 0.0)
    val all  = Sampling.weightedKeep(domains, "dom", "id", Map.empty, defaultRate = 1.0)
    assert(none.count() == 0 && all.count() == 120)
    // the md5-uniform threshold makes kept sets NESTED across rates
    def kept(r: Double) = Sampling.weightedKeep(domains, "dom", "id",
      Map("Amelia" -> r), defaultRate = 1.0)
      .filter(col("dom") === "Amelia")
      .collect().map(_.getAs[String]("id")).toSet
    val k25 = kept(0.25); val k50 = kept(0.5); val k75 = kept(0.75)
    assert(k25.subsetOf(k50) && k50.subsetOf(k75))
    assert(k25.size < k75.size)
    // stable under repartitioning (no RNG in the plan)
    val again = Sampling.weightedKeep(domains.repartition(7), "dom", "id",
      Map("Amelia" -> 0.5), defaultRate = 1.0)
      .filter(col("dom") === "Amelia")
      .collect().map(_.getAs[String]("id")).toSet
    assert(again == k50)
    // non-listed domains use the default rate untouched
    assert(Sampling.weightedKeep(domains, "dom", "id", Map("Amelia" -> 0.0),
      defaultRate = 1.0).filter(col("dom") =!= "Amelia").count() == 108)
    intercept[IllegalArgumentException] {
      Sampling.weightedKeep(domains, "dom", "id", Map("Amelia" -> 1.5))
    }
  }

  test("packByBudget: cumulative-weight banding semantics (documented approximation)") {
    val items = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 200L), ("s1", 3L, 250L),
      ("s1", 4L, 900L), // heavier than budget
      ("s1", 5L, 50L),
      ("s2", 1L, 400L), ("s2", 2L, 400L)
    ).toDF("source", "doc_id", "n_tokens")
    val packed = Sampling.packByBudget(items, "source", "doc_id", "n_tokens", 400L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("batch_id")).toMap
    // banding: batch_id = exclusive prefix sum div 400
    assert(packed(("s1", 1L)) == 0) // prefix 0
    assert(packed(("s1", 2L)) == 0) // prefix 100
    assert(packed(("s1", 3L)) == 0) // prefix 300 — batch 0 total 550 > 400: documented overshoot
    assert(packed(("s1", 4L)) == 1) // prefix 550
    assert(packed(("s1", 5L)) == 3) // prefix 1450 — heavy item forces the documented gap
    assert(packed(("s2", 1L)) == 0 && packed(("s2", 2L)) == 1)
    // ids increase with order within each group
    assert(packed(("s1", 4L)) >= packed(("s1", 3L)))
  }

  test("packByBudget and deterministicSample reject misuse") {
    val items = Seq(("s", 1L, 1L)).toDF("source", "doc_id", "n_tokens")
    intercept[IllegalArgumentException] {
      Sampling.packByBudget(items, "source", "doc_id", "n_tokens", 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(
        items.withColumn("__graft_rn", lit(1)), Seq("source"), "doc_id", 1)
    }
  }

  test("splitByHashGrouped: a whole group shares one split; singletons match splitByHash") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // groups: {0,1,2} -> rep 0, {10,11} -> rep 10; rest singleton
    val groups = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val splits = Seq(("train", 3.0), ("val", 1.0), ("test", 1.0))
    val got = Sampling.splitByHashGrouped(docs, "doc_id",
      groups, "id", "component", splits)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == got(1L) && got(1L) == got(2L))
    assert(got(10L) == got(11L))
    // group members inherit the REPRESENTATIVE's plain assignment
    val plain = Sampling.splitByHash(docs, "doc_id", splits)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(2L) == plain(0L))
    assert(got(11L) == plain(10L))
    // singletons are untouched
    (20L until 200L).foreach(i => assert(got(i) == plain(i)))
  }

  test("keepTopFraction keeps exactly the ceil cut per group with deterministic ties") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, s"g${i % 2}", (i % 4).toDouble))
      .toDF("id", "g", "score")
    val kept = Sampling.keepTopFraction(rows, "g", "score", "id", 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // 20 per group → ceil(20·0.25) = 5 kept per group
    assert(kept.count(_._2 == "g0") == 5 && kept.count(_._2 == "g1") == 5)
    // the top score tier (score 3.0: 5 members per group) fills the cut
    // exactly; tie-break by id keeps the 5 SMALLEST ids of that tier
    val g1 = kept.filter(_._2 == "g1").map(_._1).sorted.toSeq
    assert(g1 == Seq(3L, 7L, 11L, 15L, 19L))
    // fraction 1.0 keeps everything; tiny groups keep at least one row
    assert(Sampling.keepTopFraction(rows, "g", "score", "id", 1.0).count() == 40)
    val tiny = Seq((1L, "x", 0.5)).toDF("id", "g", "score")
    assert(Sampling.keepTopFraction(tiny, "g", "score", "id", 0.01).count() == 1)
    intercept[IllegalArgumentException] {
      Sampling.keepTopFraction(rows, "g", "score", "id", 0.0)
    }
  }

  test("interleaveByDomain: positions cycle domains, are unique, and need no global sort") {
    import spark.implicits._
    val docs = (0L until 90L).map(i => (i, s"d${i % 3}")).toDF("doc_id", "dom")
    val out = Sampling.interleaveByDomain(docs, "dom", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._3).distinct.length == 90)           // positions unique
    out.foreach { case (_, dom, pos) =>
      assert(pos % 3 == dom.drop(1).toLong)               // slot d of every cycle
    }
    // equal-size domains tile 0..89 completely
    assert(out.map(_._3).sorted.toSeq == (0L until 90L))
    // deterministic across evaluations
    val again = Sampling.interleaveByDomain(docs, "dom", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    out.foreach { case (id, _, pos) => assert(again(id) == pos) }
  }

  test("interleaveByDomain fails loudly on a high-cardinality domain column") {
    import spark.implicits._
    // a per-document key masquerading as a domain: the driver-held
    // index must refuse, not OOM (the temperatureMix guard)
    val docs = (0L until 50L).map(i => (i, s"url$i")).toDF("doc_id", "dom")
    val ex = intercept[IllegalArgumentException] {
      Sampling.interleaveByDomain(docs, "dom", "doc_id", maxDomains = 10)
    }
    assert(ex.getMessage.contains("maxDomains"))
    // at or under the cap the operator works unchanged
    assert(Sampling.interleaveByDomain(docs, "dom", "doc_id",
      maxDomains = 50).count() == 50)
  }

  test("tokenBudgetMix fills each domain's token budget in md5 order") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L)).toDF("doc_id", "dom", "n_tok")
    val kept = Sampling.tokenBudgetMix(docs, "dom", "doc_id", "n_tok",
      budgets = Map("a" -> 100L, "b" -> 45L), defaultBudget = 0L)
      .collect().map(r => r.getString(1) -> r.getLong(0))
    // budget 100 / 10-token docs = exactly 10 docs; 45 → first doc
    // whose PRIOR is < 45 still fits → 5 docs (priors 0..40)
    assert(kept.count(_._1 == "a") == 10)
    assert(kept.count(_._1 == "b") == 5)
    // deterministic: same call, same picks
    val again = Sampling.tokenBudgetMix(docs, "dom", "doc_id", "n_tok",
      budgets = Map("a" -> 100L, "b" -> 45L), defaultBudget = 0L)
      .collect().map(r => r.getString(1) -> r.getLong(0))
    assert(kept.toSet == again.toSet)
    // an oversized first doc is still kept (prior 0 < budget), and
    // blocks the rest of its domain
    val big = Seq((1L, "c", 1000L), (2L, "c", 10L)).toDF("doc_id", "dom", "n_tok")
    val keptBig = Sampling.tokenBudgetMix(big, "dom", "doc_id", "n_tok",
      budgets = Map("c" -> 50L)).collect()
    assert(keptBig.length == 1)
    // unlisted domains drop entirely at defaultBudget 0
    assert(kept.forall(k => k._1 == "a" || k._1 == "b"))
  }

  test("temperatureMix: exact quotas at clean powers; flattening; caps; determinism") {
    import graft.operators.Sampling
    // a: 16 docs, b: 1 doc; alpha = 1/2 → w = (4, 1), ideal = (4, 1):
    // quotas land exactly with no remainder to distribute
    val df = ((1 to 16).map(i => (i.toLong, "a")) :+ (100L, "b"))
      .toDF("id", "dom")
    val half = Sampling.temperatureMix(df, "dom", "id", total = 5L, sqrtTimes = 1)
      .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(half.toMap == Map("a" -> 4, "b" -> 1))
    // alpha = 1 reproduces the raw shares: 16/17 vs 1/17 of 5 → (5, 0)
    // after largest-remainder (fracs 4.71→0.71 for a, 0.29 for b)
    val raw = Sampling.temperatureMix(df, "dom", "id", total = 5L, sqrtTimes = 0)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length)
    assert(raw.toMap == Map("a" -> 5))
    // alpha = 1/4 flattens further: w = (2, 1) → ideal (10/3, 5/3) →
    // base (3, 1); the remainder goes to b (frac 0.67 > 0.33) but b's
    // quota caps at its single doc — the documented undershoot contract
    // (no redistribution), so 4 docs come back, not 5
    val quarter = Sampling.temperatureMix(df, "dom", "id", total = 5L, sqrtTimes = 2)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(quarter == Map("a" -> 3, "b" -> 1),
      s"flattened mix must keep the tail domain and cap at its size: $quarter")
    // quotas cap at domain size: asking for more than exists
    val capped = Sampling.temperatureMix(df, "dom", "id", total = 40L, sqrtTimes = 1)
      .collect().map(_.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(capped("b") == 1 && capped("a") <= 16)
    // membership is a pure function of the id — identical re-runs
    val a = Sampling.temperatureMix(df, "dom", "id", 5L, 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.temperatureMix(df, "dom", "id", 5L, 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "dom", "id", 5L, sqrtTimes = 9))
  }
}
