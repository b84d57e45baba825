package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond the reference surface — BASELINE.json north star).
  *
  * Everything here is pure `Column` algebra over Spark's higher-order
  * functions: no UDFs, so every operator stays inside whole-stage
  * codegen and runs at scan speed on any cluster size.
  */
object TextFunctions {

  /** Unicode normalization (native codegen'd expression; Spark has no
    * built-in). Run dedup/fingerprint/token pipelines on normalized
    * text, or visually-identical documents hash apart.
    * @param form "NFC" (default) | "NFD" | "NFKC" | "NFKD" */
  def normalize(text: Column, form: String = "NFC"): Column =
    graft.plans.native.unicodeNormalize(text, form)

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap, deterministic
    * stand-in for a real BPE vocab that needs no model file). */
  def subTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all",
      text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Word n-grams (shingles) as strings. Documents shorter than n
    * yield their single partial gram. Native one-pass kernel
    * (graft.plans) — the HOF form (transform/slice/concat_ws) is
    * interpreted and was the cost center of gram-explode queries. */
  def wordNgrams(text: Column, n: Int): Column =
    graft.plans.native.wordNgrams(text, n)

  /** Reference HOF formulation of [[wordNgrams]] — kept as the test
    * oracle for the native kernel. */
  private[graft] def wordNgramsHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** Character k-grams of the raw text. */
  def charNgrams(text: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => text.substr(i + 1, lit(k)))

  /** 64-bit document fingerprint: xxhash64 over the
    * whitespace-normalized, lower-cased text (the Spark-native,
    * codegen'd form of a rolling content hash). */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(lower(text))))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS plagiarism-detection algorithm): char-k-gram
    * poly-31 rolling hashes, sliding window of `w` hashes, rightmost-
    * minimum selection; returns the distinct selected fingerprints as
    * a sorted array<long>, each packed `pos·2^31 + hash`. Any shared
    * substring of ≥ w + k − 1 code points shares a fingerprint hash.
    * Native one-pass kernel (monotone-deque sliding min, codegen'd);
    * the hash convention is engine-mirrorable — see the q_winnow
    * oracle SQL. Unlike [[fingerprint]] (one whole-document hash),
    * this is the LOCAL fingerprint set that survives partial edits. */
  def winnowFingerprints(text: Column, k: Int = 6, w: Int = 8): Column =
    graft.plans.native.winnow(text, k, w)

  /** Tiny per-language stopword sets for the n-gram/stopword language
    * heuristic. Deliberately small: language ID at pipeline scale is a
    * coarse filter, not a classifier. */
  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "une", "des", "que", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "como", "más", "por"))

  /** Language ID: argmax of stopword hits per language, deterministic
    * tie-break on language code, "und" (undetermined) when no stopword
    * of any language occurs. Native one-pass kernel
    * (graft.plans.LangIdExpr); semantics mirrored by the DuckDB oracle
    * SQL in SparkEntry. */
  def langId(text: Column): Column =
    graft.plans.native.langId(tokens(lower(text)))

  /** Chunk a document into token windows of `size` with `overlap`
    * tokens shared between consecutive chunks (context-window prep for
    * training pipelines). Emits an array of (chunk_start, chunk_text)
    * structs — explode downstream. Chunk starts are 0, step, 2·step, …
    * with step = size − overlap; every document yields ≥ 1 chunk. */
  def chunks(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = tokens(text)
    val lastStart = greatest(size(toks) - overlap, lit(1)) - 1
    transform(
      sequence(lit(0), lastStart, lit(step)),
      start => struct(
        start.as("chunk_start"),
        concat_ws(" ", slice(toks, start + 1, lit(chunkSize))).as("chunk_text")))
  }

  /** Total characters across tokens (= text length minus whitespace). */
  def tokenChars(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, t) => acc + length(t))

  /** Count of English stopword tokens. */
  def stopwordCount(text: Column): Column = {
    val en = array(stopwords("en").map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(en, t)))
  }

  /** PII redaction patterns — written in the regex subset common to
    * Java's engine and RE2 (no lookaround, no backrefs) so an external
    * SQL engine applying the same pattern produces identical output. */
  private[graft] val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val phonePattern = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}"

  /** Redact email addresses and phone-number-shaped substrings — the
    * minimum-viable PII scrub for a training-data pipeline (extend the
    * pattern list for production use). Pure regexp_replace: codegen'd,
    * scan-speed, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Canonical URL for URL-level deduplication — the normalization web
    * pipelines apply BEFORE content dedup so `HTTP://Host.COM:80/a#x`
    * and `http://host.com/a` collapse to one key:
    *
    *  - scheme and host lower-cased (path/query case is significant
    *    and preserved);
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - fragment dropped;
    *  - `utm_*` tracking parameters dropped, remaining query
    *    parameters kept in original order (`?` dropped when none
    *    survive);
    *  - empty path normalized to `/`.
    *
    * Pure column algebra — `regexp_extract` + array ops, codegen'd, no
    * UDF. The patterns avoid lookaround so the SAME expressions run on
    * RE2-based engines (the correctness oracle mirrors them verbatim in
    * DuckDB). Non-URL input (no `scheme://`) degrades gracefully: every
    * extract returns `""` and the result is `:///`-prefixed garbage the
    * caller can filter on, never an exception.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptQuery = array_join(
      filter(split(query, "&"),
        x => length(x) > 0 && !x.startsWith("utm_")),
      "&")
    concat(scheme, lit("://"), host, path,
      when(keptQuery === "", lit(""))
        .otherwise(concat(lit("?"), keptQuery)))
  }

  /** [nTokens, totalGrams, distinctGrams] for word n-grams — one
    * native codegen'd pass over the text (graft.plans). */
  def repetitionStats(text: Column, n: Int): Column =
    graft.plans.native.repetitionStats(text, n)

  /** Repeated word-n-gram fraction in [0,1]: 1 − distinct/total grams
    * (0 for empty text). High values flag boilerplate / degenerate
    * repetition — a standard training-data quality signal. */
  def repetitionRatio(text: Column, n: Int): Column =
    repetitionRatioFrom(repetitionStats(text, n))

  /** Ratio from a precomputed [[repetitionStats]] column (share the
    * one-pass kernel when the caller also wants the token count). */
  def repetitionRatioFrom(stats: Column): Column = {
    val total = element_at(stats, 2).cast("double")
    lit(1d) - element_at(stats, 3).cast("double") / total
  }

  /** Deterministic quality score in [0,1]:
    *   0.4 · min(nTokens/100, 1)            — enough content
    * + 0.3 · min(stopwordRatio·5, 1)        — natural-language-ness
    * + 0.3 · [3 ≤ mean token length ≤ 10]   — not shredded, not garbage
    * All inputs are integer counts, so the arithmetic is per-row IEEE
    * deterministic (reproducible across engines).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanLen = when(nTok > 0, tokenChars(text).cast("double") / nTok).otherwise(lit(0d))
    val stopRatio = when(nTok > 0, stopwordCount(text).cast("double") / nTok).otherwise(lit(0d))
    least(nTok / lit(100d), lit(1d)) * lit(0.4) +
      least(stopRatio * lit(5d), lit(1d)) * lit(0.3) +
      when(meanLen >= 3d && meanLen <= 10d, lit(1d)).otherwise(lit(0d)) * lit(0.3)
  }

  /** Deflate compression ratio (compressed bytes / raw bytes; empty →
    * 1.0) — the zlib redundancy signal the Gopher/FineWeb quality
    * pipelines threshold on: template spam and keyword stuffing
    * compress far below natural prose; near-1 ratios flag
    * random-looking content. ORDINAL across JVMs (exact bytes depend
    * on the bundled zlib); deterministic within one. Native codegen'd
    * kernel with a per-thread reused Deflater. */
  def compressionRatio(text: Column): Column =
    graft.plans.native.deflateRatio(text)

  // ── deterministic augmentation / denoising-objective construction ──

  private def prfThreshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    math.floor(rate * 2147483647.0).toLong
  }

  /** Deterministic word dropout: token i of document `id` drops with
    * probability ≈ `rate` under a seeded integer PRF — membership is a
    * pure function of (id, position, seed), so re-runs, retries and
    * engines agree token-for-token (an RNG-based dropout would break
    * exactly-once semantics on task retry). Survivors re-join with
    * single spaces. Shuffle-free codegen'd projection. */
  def wordDropout(id: Column, text: Column, rate: Double, seed: Long): Column =
    graft.plans.native.wordDropout(id.cast("long"), text,
      prfThreshold(rate), seed)

  /** Block-deterministic span corruption (T5-style denoising pairs):
    * token blocks of `blockLen` mask with probability ≈ `rate`; a
    * masked block collapses to `<extra_id_b>` (b = block index) in the
    * corrupted text, and the target lists each sentinel with the
    * original tokens it hides. Returns struct(corrupted, target).
    * Sentinels carry the block index rather than a running counter —
    * the construction stays a pure per-block function (no sequential
    * scan), which is what makes it reproducible AND cheap at scale. */
  def spanCorrupt(id: Column, text: Column, blockLen: Int,
      rate: Double, seed: Long): Column = {
    val joined = graft.plans.native.spanCorrupt(id.cast("long"), text,
      blockLen, prfThreshold(rate), seed)
    val parts = split(joined, "\u0001", 2)
    struct(element_at(parts, 1).as("corrupted"),
      element_at(parts, 2).as("target"))
  }

  /** HTML → text extraction (the CommonCrawl-style curation step that
    * precedes every text-quality operator), as a PURE chain of
    * regexp/replace builtins — no UDF, whole-stage codegen, and every
    * pattern is RE2-safe with inline flags so any engine replays the
    * contract byte-for-byte (the q_html_extract oracle does, in
    * DuckDB). Deliberately a specified-subset extractor, not a
    * browser: documented steps over well-formed-ish markup, because a
    * reproducible approximation beats an unreproducible "smart" one
    * for corpus curation.
    *
    * Steps, in order:
    *  1. drop `<script…>…</script>` / `<style…>…</style>` blocks
    *     (case-insensitive, dot-matches-newline, non-greedy) and
    *     `<!-- … -->` comments;
    *  2. block-level closers/breaks (`<br>`, `</p>`, `</div>`,
    *     `</li>`, `</h1-6>`, `</tr>`) become newlines; every other
    *     tag is stripped;
    *  3. decode the five core entities (`&lt; &gt; &quot; &#39;/
    *     &apos; &nbsp;`) then `&amp;` LAST, so `&amp;lt;` correctly
    *     yields the literal `&lt;`;
    *  4. whitespace: horizontal runs collapse to one space, spaces
    *     around newlines drop, ≥3 newlines collapse to a blank line,
    *     ends trim.
    */
  /** Dictionary term normalization (contraction / slang / alias
    * expansion — the token-level cleanup pass between extraction and
    * dedup): token t becomes dict(t) when mapped, else itself; tokens
    * re-join with single spaces (so the output is already
    * whitespace-canonical for downstream shingling). The dictionary
    * rides the plan as a MAP LITERAL — bounded like a codebook, so
    * the pass is a shuffle-free codegen'd projection: no UDF, no join,
    * no broadcast exchange. Matching is exact and case-sensitive;
    * compose with `lower()` upstream for case-folded dictionaries. */
  def normalizeTerms(text: Column, dict: Map[String, String]): Column = {
    require(dict.nonEmpty, "normalizeTerms: empty dictionary")
    val m = map(dict.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    array_join(transform(tokens(text),
      t => coalesce(element_at(m, t), t)), " ")
  }

  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", ""),
      "(?s)<!--.*?-->", "")
    val noTags = regexp_replace(regexp_replace(noBlocks,
      "(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n"),
      "(?s)<[^>]*>", "")
    val decoded = replace(replace(replace(replace(replace(replace(replace(
      noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&apos;"), lit("'")), lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(decoded,
      "[ \t\r]+", " "),
      " ?\n ?", "\n"),
      "\n{3,}", "\n\n"),
      "^\\s+|\\s+$", "")
  }
}
