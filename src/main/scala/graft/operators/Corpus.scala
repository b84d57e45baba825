package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics for training-data pipelines: inverted
  * index (posting lists), document-frequency term scoring, and n-gram
  * language-model counts.
  *
  * Scale shape: every operator is one explode + one hash-aggregation
  * keyed by term/gram — map-side partial aggregation bounds the shuffle
  * by the number of DISTINCT terms per partition, not the token count.
  * Nothing here collects to the driver.
  */
object Corpus {

  /** Whitespace tokens, lower-cased — the indexing normalization shared
    * by [[invertedIndex]] and [[topTermsByRarity]]. */
  private def terms(textCol: Column): Column =
    TextFunctions.tokens(lower(textCol))

  /** Inverted index as posting ROWS: one row per (term, doc) pair with
    * the term's document frequency attached.
    *
    * Emitting rows rather than `collect_list` posting arrays keeps the
    * operator scalable: a degenerate term appearing in every document
    * ("the") becomes many small rows spread across partitions instead
    * of one array that must fit in a single task's memory. Downstream
    * consumers re-assemble arrays per term only after their own
    * filtering (e.g. `df <= cap`).
    *
    * Document frequency is a map-side-combined `groupBy(term).count`
    * joined back onto the postings — NOT `count().over(Window.partitionBy
    * (term))`, which has no partial aggregation and would funnel every
    * posting row of a stop-word term through one window task. With the
    * groupBy, a degenerate term costs one combined count per partition;
    * the join back is skew-splittable by AQE (and the df relation is
    * vocabulary-sized, so AQE typically broadcasts it outright).
    *
    * @return (term, df, doc_id) — df = number of distinct documents
    *         containing the term
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val postings = df
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(terms(col(textCol)))).as("term"))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    postings.join(dfreq, "term")
      .select(col("term"), col("df"), col("doc_id"))
  }

  /** Top-k terms per document, scored by term frequency × rarity.
    *
    * `idf = "inv"` (default) scores tf · (1/df) — a monotone rarity
    * weight computed with a single correctly-rounded IEEE division, so
    * the score is bit-identical on ANY engine (the property the
    * correctness gate hashes on). `idf = "log"` scores the classic
    * tf · (ln(N/df) + 1); ln is NOT correctly rounded and differs
    * between libm implementations by ulps, so use it for real ranking
    * but don't hash-compare it across engines.
    *
    * Ties are broken by term ascending — fully deterministic output.
    *
    * Two shuffles: one keyed by (doc, term) for tf, one keyed by term
    * for df; the final top-k window re-uses the doc partitioning.
    *
    * @return (doc_id, term, tf, df, score, rnk) with rnk ≤ k
    */
  def topTermsByRarity(
      df: DataFrame, idCol: String, textCol: String, k: Int,
      idf: String = "inv"): DataFrame = {
    require(k > 0, "k must be > 0")
    require(idf == "inv" || idf == "log", s"idf must be 'inv' or 'log', got '$idf'")
    // corpus size is only needed for the log idf — don't pay the count
    // job on the default path
    lazy val nDocs = df.filter(col(textCol).isNotNull).count()
    val tf = df
      .select(col(idCol).as("doc_id"), explode(terms(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score",
        if (idf == "inv")
          col("tf").cast("double") / col("df").cast("double")
        else
          col("tf").cast("double") *
            (log(lit(nDocs.toDouble) / col("df").cast("double")) + lit(1.0)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  /** Corpus n-gram counts (language-model statistics): every word
    * n-gram of every document, counted across the corpus, kept when
    * seen at least `minCount` times.
    *
    * The n-gram explode runs inside whole-stage codegen (native
    * wordNgrams kernel); counting is one hash-aggregate keyed by gram
    * with map-side partials, so shuffle volume is bounded by distinct
    * grams — at 100 TB add a power-of-two `minCount` pre-filter per
    * partition (count-min style) before the exact pass if distinct
    * grams outgrow the cluster.
    *
    * Case is preserved (same token semantics as [[Dedup.decontaminate]]).
    *
    * @return (gram, n) with n ≥ minCount
    */
  def ngramCounts(
      df: DataFrame, textCol: String, n: Int, minCount: Long = 1L): DataFrame = {
    require(n > 0, "n must be > 0")
    require(minCount >= 1, "minCount must be >= 1")
    df.select(explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
