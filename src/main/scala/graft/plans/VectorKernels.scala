package graft.plans

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the native expressions (NativeExpressions
  * .scala). Called from generated code — one static call per row, no
  * boxing, no per-element lambda dispatch.
  *
  * Why these exist (measured, sf0.1): Spark's higher-order functions
  * (`transform`/`aggregate`/`zip_with`) are interpreted — a MinHash
  * signature as nested HOFs costs numPerm × |shingles| boxed lambda
  * invocations per row and made q_dedup_minhash take 260 s. The same
  * math as a fused while-loop is ~2 orders of magnitude faster and
  * keeps the surrounding plan inside whole-stage codegen.
  */
object VectorKernels {

  /** Distinct hashes of word n-gram shingles, one pass over the raw
    * UTF-8 bytes: tokenize on ASCII whitespace, hash each token, chain
    * n consecutive token hashes into a shingle hash, sort-dedupe.
    * Replaces split → transform → slice → concat_ws → xxhash64 →
    * array_distinct (six interpreted HOF nodes and ~10 allocations per
    * shingle). */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // locate tokens
    var nTok = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts(nTok) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.emptyLongArray)
    val tokHash = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      tokHash(t) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + starts(t),
        ends(t) - starts(t), 0L)
      t += 1
    }
    val span = math.min(n, nTok)
    val nShingles = nTok - span + 1
    val out = new Array[Long](nShingles)
    var s = 0
    while (s < nShingles) {
      var h = 0L
      var k = 0
      while (k < span) { h = XXH64.hashLong(tokHash(s + k), h); k += 1 }
      out(s) = h
      s += 1
    }
    java.util.Arrays.sort(out)
    var uniq = 0
    var j = 0
    while (j < nShingles) {
      if (j == 0 || out(j) != out(j - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  /** Stopword tables for the language-ID kernel, materialized once per
    * JVM as UTF8String hash sets (sorted lang order = tie-break order,
    * matching the SQL oracle's CASE chain). */
  private lazy val langTable: Array[(UTF8String, java.util.HashSet[UTF8String])] =
    graft.functions.TextFunctions.stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val set = new java.util.HashSet[UTF8String]()
      words.foreach(w => set.add(UTF8String.fromString(w)))
      (UTF8String.fromString(lang), set)
    }.toArray

  private val UND = UTF8String.fromString("und")

  /** Language ID over lower-cased tokens: stopword hits per language,
    * argmax with earliest-language tie-break, "und" on zero hits.
    * One pass over the tokens; semantics identical to the interpreted
    * HOF form and the DuckDB oracle SQL. */
  def langId(tokens: ArrayData): UTF8String = {
    val nLang = langTable.length
    val counts = new Array[Int](nLang)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      if (t != null) {
        var l = 0
        while (l < nLang) {
          if (langTable(l)._2.contains(t)) counts(l) += 1
          l += 1
        }
      }
      j += 1
    }
    var best = 0
    var l = 1
    while (l < nLang) {
      if (counts(l) > counts(best)) best = l
      l += 1
    }
    if (counts(best) == 0) UND else langTable(best)._1
  }

  // ASCII \s of java.util.regex: [ \t\n\x0B\f\r] — must agree with the
  // split("\\s+") tokenizer used by TextFunctions.tokens
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Word n-grams as strings (tokens joined by a single space), one
    * pass over the raw UTF-8 bytes — the gram bytes are assembled
    * directly from the token byte ranges, no intermediate Strings.
    * Contract identical to the HOF form (split/slice/concat_ws):
    * shorter-than-n documents yield their single partial gram;
    * whitespace-only text yields one empty gram. */
  def wordNgramStrings(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts(nTok) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val span = math.min(n, nTok)
    val nGrams = nTok - span + 1
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      var size = span - 1 // separators
      var k = 0
      while (k < span) { size += ends(g + k) - starts(g + k); k += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < span) {
        if (k > 0) { buf(pos) = ' '; pos += 1 }
        val tl = ends(g + k) - starts(g + k)
        System.arraycopy(bytes, starts(g + k), buf, pos, tl)
        pos += tl
        k += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass repetition stats: [nTokens, totalGrams, distinctGrams]
    * for word n-grams, with EXACT string distinctness (tokens are
    * interned to ids via a hash map — no hash-collision false merges,
    * unlike [[shingleHashes]]). Matches the `tokens`/`wordNgrams`
    * contract: whitespace-only text yields the single empty gram.
    * Replaces transform + slice + concat_ws + array_distinct (the
    * interpreted-HOF form was ~10× slower at sf0.1). */
  def repetitionStats(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts(nTok) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array(0L, 1L, 1L))
    val span = math.min(n, nTok)
    val nGrams = nTok - span + 1
    if (nGrams == 1) return new GenericArrayData(Array(nTok.toLong, 1L, 1L))
    // intern tokens: equal byte sequences → equal ids (exact, not hashed)
    val ids = new Array[Int](nTok)
    val intern = new java.util.HashMap[String, Integer](nTok * 2)
    var t = 0
    while (t < nTok) {
      val s = new String(bytes, starts(t), ends(t) - starts(t),
        java.nio.charset.StandardCharsets.UTF_8)
      var id = intern.get(s)
      if (id == null) { id = intern.size(); intern.put(s, id) }
      ids(t) = id
      t += 1
    }
    // distinct id-sequences == distinct gram strings (tokens contain no
    // whitespace, so the " "-join is injective)
    val seen = new java.util.HashSet[String](nGrams * 2)
    val sb = new java.lang.StringBuilder(span * 7)
    var g = 0
    var distinct = 0L
    while (g < nGrams) {
      sb.setLength(0)
      var k = 0
      while (k < span) { sb.append(ids(g + k)).append(','); k += 1 }
      if (seen.add(sb.toString)) distinct += 1
      g += 1
    }
    new GenericArrayData(Array(nTok.toLong, nGrams.toLong, distinct))
  }

  /** Positions where two equal-length long arrays agree (MinHash
    * signature agreement count). */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"signature length mismatch: $n vs ${b.numElements()}")
    var i = 0
    var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** MinHash signature: out[i] = min over shingles of XXH64(h, seed=i). */
  def minhash(shingles: ArrayData, numPerm: Int): ArrayData = {
    val out = new Array[Long](numPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val h = shingles.getLong(j)
      var i = 0
      while (i < numPerm) {
        val v = XXH64.hashLong(h, i)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array: bit i = sign of Σ ±1 where the
    * sign is bit i of XXH64(token). */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val t = tokens.getUTF8String(j)
      if (t != null) {
        val h = XXH64.hashUTF8String(t, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Cosine similarity, one fused pass (dot + both norms). Per-side
    * element accessors (mixed float/double inputs are legal); dimension
    * mismatch is an error, not a silent truncation. Returns 0 when
    * either norm is 0 (degenerate vector). */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine: dimension mismatch (${a.numElements()} vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) dot / d else 0.0
  }

  /** Nearest-centroid id (1-based) by max cosine, ties → smallest id.
    * `cents` is the k × dim centroid matrix flattened row-major with
    * each row L2-NORMALIZED by the caller, so argmax cosine reduces to
    * argmax dot product (the vector's own norm is a positive constant
    * across centroids and cannot change the argmax; a zero vector or
    * zero centroid scores 0, matching [[cosine]]'s convention). One
    * fused k·dim loop per row — the assignment stays a single compact
    * codegen'd call however large k grows, where a greatest()-of-k
    * expression tree blows past the JIT's method limits in the
    * hundreds. */
  def nearestCentroid(
      cents: Array[Double], k: Int, v: ArrayData, isFloat: Boolean): Int = {
    val dim = cents.length / k
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearestCentroid: dimension mismatch (vector ${v.numElements()} " +
          s"vs centroid $dim)")
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += cents(off + i) * x
        i += 1
      }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best + 1
  }

  /** L2-normalize to a unit-length double vector, one fused pass
    * (norm + divide). Zero vectors pass through unchanged (cast to
    * double), matching the declarative form it replaces — which, as an
    * interpreted aggregate+transform HOF pair, cost ~125 µs/row at
    * dim 64 and dominated every PQ stage it touched. */
  def l2Normalize(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x
      ss += x * x
      i += 1
    }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      var j = 0
      while (j < n) { out(j) *= inv; j += 1 }
    }
    new GenericArrayData(out)
  }

  /** Occurrence-expanded word n-gram shingle hashes for WEIGHTED
    * (multiset) Jaccard: the k-th occurrence of a gram hashes to
    * XXH64(k, gramHash) — distinct by construction — so the PLAIN set
    * Jaccard of two expanded sets equals the weighted Jaccard
    * Σ min(cₐ,c_b) / Σ max(cₐ,c_b) of the gram bags exactly (integer
    * weights). MinHash/LSH over these hashes therefore estimates
    * weighted Jaccard with unchanged machinery. Output order follows
    * the sorted gram-hash runs (deterministic). */
  def shingleHashesWeighted(text: UTF8String, n: Int): ArrayData = {
    val base = shingleHashesAll(text, n)
    java.util.Arrays.sort(base)
    val out = new Array[Long](base.length)
    var i = 0
    var occ = 0L
    while (i < base.length) {
      if (i > 0 && base(i) == base(i - 1)) occ += 1 else occ = 0L
      out(i) = XXH64.hashLong(occ, base(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All word n-gram shingle hashes WITH multiplicity (the non-deduped
    * core [[shingleHashes]] sorts+dedupes and
    * [[shingleHashesWeighted]] occurrence-expands). */
  private def shingleHashesAll(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts(nTok) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok == 0) return new Array[Long](0)
    val tokHash = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      tokHash(t) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + starts(t),
        ends(t) - starts(t), 0L)
      t += 1
    }
    // same span semantics as [[shingleHashes]]/[[wordNgramStrings]]: a
    // doc shorter than n tokens yields its single partial gram
    val span = math.min(n, nTok)
    val nSh = nTok - span + 1
    val out = new Array[Long](nSh)
    var s = 0
    while (s < nSh) {
      var h = 0L
      var k = 0
      while (k < span) { h = XXH64.hashLong(tokHash(s + k), h); k += 1 }
      out(s) = h
      s += 1
    }
    out
  }

  /** Product-quantization encode: the vector is split into `m`
    * contiguous subspaces of `subDim = cents.length / (m*k)` dimensions
    * and each subvector is assigned its L2-NEAREST sub-centroid
    * (1-based, ties → smallest id). `cents` layout is
    * `((mi*k + code-1)*subDim + j)` — all of subspace 0's k centroids,
    * then subspace 1's, etc. Unlike [[nearestCentroid]] (cosine
    * assignment over whole normalized vectors) this is true squared-L2
    * argmin: PQ subvectors are not unit-norm, so dot-product argmax
    * would mis-assign. One fused m·k·subDim loop per row. */
  def pqEncode(cents: Array[Double], m: Int, k: Int, v: ArrayData,
      isFloat: Boolean): ArrayData = {
    val subDim = cents.length / (m * k)
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pqEncode: dimension mismatch (vector ${v.numElements()} " +
          s"vs m*subDim = ${m * subDim})")
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val vOff = mi * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (mi * k + c) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = if (isFloat) v.getFloat(vOff + j).toDouble
                  else v.getDouble(vOff + j)
          val diff = x - cents(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best + 1
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** [[pqEncode]] packed into ONE long: subspace mi's (code-1) sits in
    * bits [4·mi, 4·mi+4). Requires k ≤ 16 and m ≤ 16 — the standard
    * PQ configuration — and shrinks the per-row payload from an
    * array<int> (20+ bytes of UnsafeArrayData header + 4·m data) to a
    * bare 8-byte column: the scan/shuffle format the 100 TB code
    * table actually wants. */
  def pqEncodePacked(cents: Array[Double], m: Int, k: Int, v: ArrayData,
      isFloat: Boolean): Long = {
    val codes = pqEncode(cents, m, k, v, isFloat)
    var packed = 0L
    var mi = 0
    while (mi < m) {
      packed |= (codes.getInt(mi) - 1).toLong << (4 * mi)
      mi += 1
    }
    packed
  }

  /** [[pqAdc]] over a packed long code word (layout of
    * [[pqEncodePacked]]). */
  def pqAdcPacked(cents: Array[Double], m: Int, k: Int, packed: Long,
      probe: ArrayData, probeFloat: Boolean): Double = {
    val subDim = cents.length / (m * k)
    if (probe.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pqAdcPacked: probe dimension ${probe.numElements()} " +
          s"vs m*subDim = ${m * subDim}")
    var dot = 0.0
    var mi = 0
    while (mi < m) {
      val code = ((packed >>> (4 * mi)) & 0xFL).toInt
      val off = (mi * k + code) * subDim
      val pOff = mi * subDim
      var j = 0
      while (j < subDim) {
        val x = if (probeFloat) probe.getFloat(pOff + j).toDouble
                else probe.getDouble(pOff + j)
        dot += cents(off + j) * x
        j += 1
      }
      mi += 1
    }
    dot
  }

  /** Asymmetric-distance dot product: Σ over subspaces of
    * ⟨probe subvector, the sub-centroid `codes[mi]` points at⟩ — the
    * probe stays exact (asymmetric), only the data side is quantized.
    * Same `cents` layout as [[pqEncode]]. O(dim) per call; the PQ win
    * is the DATA side of the join carrying m ints instead of dim
    * floats, not the arithmetic. */
  def pqAdc(cents: Array[Double], m: Int, k: Int, codes: ArrayData,
      probe: ArrayData, probeFloat: Boolean): Double = {
    val subDim = cents.length / (m * k)
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pqAdc: code length ${codes.numElements()} != m = $m")
    if (probe.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pqAdc: probe dimension ${probe.numElements()} " +
          s"vs m*subDim = ${m * subDim}")
    var dot = 0.0
    var mi = 0
    while (mi < m) {
      val code = codes.getInt(mi)
      if (code < 1 || code > k)
        throw new IllegalArgumentException(
          s"pqAdc: code $code out of range 1..$k in subspace $mi")
      val off = (mi * k + code - 1) * subDim
      val pOff = mi * subDim
      var j = 0
      while (j < subDim) {
        val x = if (probeFloat) probe.getFloat(pOff + j).toDouble
                else probe.getDouble(pOff + j)
        dot += cents(off + j) * x
        j += 1
      }
      mi += 1
    }
    dot
  }

  /** Per-thread Deflater at a FIXED level — reused across rows (a
    * Deflater allocates native zlib state; per-row construction would
    * dominate the kernel). ended/reset per call. */
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION))

  /** Deflate compression ratio of the UTF-8 bytes: compressed size /
    * raw size (empty text → 1.0). A one-number redundancy signal —
    * the Gopher/FineWeb-style quality feature: boilerplate, template
    * spam, and keyword stuffing compress far below natural prose,
    * while high ratios flag random-looking (encrypted/binary-pasted)
    * content. Deterministic for a fixed JVM's zlib at the default
    * level; treat cross-JVM values as ordinal, not exact (the gates
    * assert ORDERING properties only). */
  def deflateRatio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](1024)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }

  /** Z-order (Morton) value: interleave the low `bits` bits of each of
    * the n input values — bit b of column c lands at position b·n + c,
    * so a lexicographic sort on the result is a space-filling-curve
    * sort balanced across ALL columns (the multi-dimensional
    * clustering [[graft.operators.Layout.writeClustered]]'s scaladoc
    * points to). Inputs must be non-negative; n·bits ≤ 63. */
  def zValue(vals: ArrayData, bits: Int): Long = {
    val n = vals.numElements()
    if (n * bits > 63)
      throw new IllegalArgumentException(
        s"zValue: $n columns × $bits bits exceeds 63")
    var z = 0L
    var c = 0
    while (c < n) {
      val v = vals.getLong(c)
      if (v < 0)
        throw new IllegalArgumentException(
          s"zValue: negative input $v in column $c — offset to " +
            "non-negative before interleaving")
      var b = 0
      while (b < bits) {
        z |= ((v >>> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    z
  }

  /** The `nprobe` nearest centroid ids (1-based, by descending dot
    * against rows the caller L2-normalized; ties → smaller id),
    * returned best-first. The multi-assignment form of
    * [[nearestCentroid]]: k-NN graph construction posts each vector to
    * several lists so near-boundary neighbours share at least one
    * list. Selection is an O(k·nprobe) insertion pass — nprobe is a
    * small constant (2–4), k-independent code size. */
  def nearestCentroids(
      cents: Array[Double], k: Int, nprobe: Int, v: ArrayData,
      isFloat: Boolean): ArrayData = {
    val dim = cents.length / k
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearestCentroids: dimension mismatch (vector ${v.numElements()} " +
          s"vs centroid $dim)")
    val n = math.min(nprobe, k)
    val bestIds = new Array[Int](n)
    val bestDots = new Array[Double](n)
    java.util.Arrays.fill(bestDots, Double.NegativeInfinity)
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += cents(off + i) * x
        i += 1
      }
      // insertion: strictly-greater keeps the earlier (smaller) id on ties
      var pos = n
      while (pos > 0 && dot > bestDots(pos - 1)) pos -= 1
      if (pos < n) {
        var j = n - 1
        while (j > pos) {
          bestDots(j) = bestDots(j - 1); bestIds(j) = bestIds(j - 1); j -= 1
        }
        bestDots(pos) = dot
        bestIds(pos) = c + 1
      }
      c += 1
    }
    new GenericArrayData(bestIds)
  }

  /** Hyperplane LSH signature: bit p = sign of ⟨v, plane_p⟩ where
    * plane_p[j] is a deterministic pseudo-random value in [-1, 1)
    * derived from XXH64 — reproducible across runs/executors (no RNG in
    * a distributed plan). `seed` selects an independent plane set (a
    * golden-ratio multiple folded into the hash seed; seed 0 is the
    * original plane set), so callers can draw more than 64 total bits
    * as several independent ≤64-bit signatures — the per-BAND form LSH
    * banding needs at scale. isFloat selects the element accessor. */
  def hyperplaneSig(v: ArrayData, bits: Int, isFloat: Boolean, seed: Long): Long = {
    val dim = v.numElements()
    val hashSeed = 42L + seed * 0x9E3779B97F4A7C15L
    var sig = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var j = 0
      while (j < dim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        val h = XXH64.hashLong(p.toLong * 1000003L + j, hashSeed)
        val comp = (java.lang.Math.floorMod(h, 2000001L).toDouble / 1000000.0) - 1.0
        dot += x * comp
        j += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Unicode normalization of a UTF8String. `form`: 0=NFC, 1=NFD,
    * 2=NFKC, 3=NFKD. Fast path: java.text.Normalizer.isNormalized on
    * the decoded string costs one scan and is true for almost all real
    * text (ASCII trivially), skipping the allocation-heavy transform. */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val f = form match {
      case 0 => java.text.Normalizer.Form.NFC
      case 1 => java.text.Normalizer.Form.NFD
      case 2 => java.text.Normalizer.Form.NFKC
      case 3 => java.text.Normalizer.Form.NFKD
      case _ => throw new IllegalArgumentException(s"bad normalization form code $form")
    }
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Second bloom hash derived from the first by a finalizer-style
    * avalanche (splitmix64 tail); forced odd so the double-hashing
    * probe sequence h1 + i·h2 cycles through all bit positions of the
    * power-of-two-sized filter. */
  private def bloomH2(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  /** Set the k double-hashed bit positions of `hash` in a bloom bitset.
    * `bits.length` MUST be a power of two (the probe index is masked,
    * not mod'd). Mutates in place — build-side aggregation only. */
  def bloomSet(bits: Array[Byte], hash: Long, k: Int): Unit = {
    val mBits = bits.length.toLong * 8L
    val mask = mBits - 1L
    val h2 = bloomH2(hash)
    var i = 0
    var h = hash
    while (i < k) {
      val pos = h & mask
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      h += h2
      i += 1
    }
  }

  /** Hashed adjacent-token bigram feature buckets (DSIR, Xie et al.
    * 2023 "Data Selection for Language Models via Importance
    * Resampling"): tokenize on ASCII whitespace, join each adjacent
    * token pair with a single space, hash the bigram with the
    * ENGINE-MIRRORABLE poly-31 code-point hash
    * `h = fold(cp)(h·31 + cp) mod 2^31`, bucket = `h mod buckets`.
    *
    * The hash is deliberately NOT xxhash: a SQL oracle must replay it
    * exactly, and poly-31 over Unicode code points is expressible as a
    * `list_reduce` over `unicode(ch)` in DuckDB while staying exact in
    * 64-bit integers (the accumulator is < 2^31 before each step, so
    * `h·31 + cp < 2^36`). One array slot per bigram OCCURRENCE —
    * counting happens downstream where partial aggregation applies.
    * Fewer than two tokens → empty array. */
  def hashedBigramBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    // token boundaries over chars (ASCII \s matches isWs on bytes for
    // the BMP; supplementary chars are never whitespace)
    var nTok = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWsChar(s.charAt(i))) i += 1
      if (i < len) {
        starts(nTok) = i
        while (i < len && !isWsChar(s.charAt(i))) i += 1
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok < 2) return new GenericArrayData(Array.emptyIntArray)
    // per-token poly-31 partial: hash of "tok" resumed into "tok a b"
    // chains, computed per bigram from the raw chars
    val out = new Array[Int](nTok - 1)
    var t = 0
    while (t < nTok - 1) {
      var h = 0L
      var k = starts(t)
      while (k < ends(t)) {
        val cp = s.codePointAt(k)
        h = (h * 31L + cp) % 2147483648L
        k += Character.charCount(cp)
      }
      h = (h * 31L + ' '.toInt) % 2147483648L
      k = starts(t + 1)
      while (k < ends(t + 1)) {
        val cp = s.codePointAt(k)
        h = (h * 31L + cp) % 2147483648L
        k += Character.charCount(cp)
      }
      out(t) = (h % buckets).toInt
      t += 1
    }
    new GenericArrayData(out)
  }

  // char twin of isWs for the String-based DSIR kernel
  private def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B

  /** All code-point substrings of length [minLen, maxLen] of every
    * whitespace token — the candidate stream for subword-vocabulary
    * training. One row per OCCURRENCE (frequency counting happens in
    * the downstream aggregation). Contract mirrored by the SQL oracle:
    * words from \s+ splitting, positions/lengths in code points. */
  def charNgramsByWord(text: UTF8String, minLen: Int, maxLen: Int): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWsChar(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWsChar(s.charAt(i))) i += 1
        // code-point index of each char offset inside the word
        val w = s.substring(start, i)
        val cps = w.codePoints().toArray
        var p = 0
        while (p < cps.length) {
          var l = minLen
          while (l <= maxLen && p + l <= cps.length) {
            out.add(UTF8String.fromString(
              new String(cps, p, l)))
            l += 1
          }
          p += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Greedy longest-match subword tokenization of every whitespace
    * token against a fixed vocabulary: at each code-point position try
    * the longest vocabulary entry first; when nothing matches, emit the
    * single code point and advance (every character is implicitly in
    * the vocabulary — no <unk>). Deterministic and engine-mirrorable:
    * the SQL oracle replays the same scan with a recursive CTE. */
  def greedySubTokens(text: UTF8String, vocab: Array[String]): ArrayData = {
    val (set, maxLen) = vocabCache(vocab)
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWsChar(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWsChar(s.charAt(i))) i += 1
        val cps = s.substring(start, i).codePoints().toArray
        var p = 0
        while (p < cps.length) {
          var l = math.min(maxLen, cps.length - p)
          var tok: String = null
          while (tok == null && l >= 1) {
            val cand = new String(cps, p, l)
            if (set.contains(cand)) tok = cand else l -= 1
          }
          if (tok == null) { tok = new String(cps, p, 1); l = 1 }
          out.add(UTF8String.fromString(tok))
          p += l
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  // per-vocab-array memo of (hash set, max entry length in code points):
  // the same Array[String] reference travels with the serialized plan,
  // so identity-keying caches the set once per executor. Bounded: a
  // long-lived executor that sees many DISTINCT vocab plans (or a test
  // loop) must not accumulate dead sets — evict wholesale past a small
  // cap (re-interning a live vocab is cheap; leaking is not).
  private val vocabSets =
    new java.util.concurrent.ConcurrentHashMap[Array[String], (java.util.HashSet[String], Int)]()
  private def vocabCache(vocab: Array[String]): (java.util.HashSet[String], Int) = {
    if (vocabSets.size > 64) vocabSets.clear()
    vocabSets.computeIfAbsent(vocab, v => {
      val set = new java.util.HashSet[String]()
      var maxLen = 1
      v.foreach { g =>
        set.add(g)
        maxLen = math.max(maxLen, g.codePointCount(0, g.length))
      }
      (set, maxLen)
    })
  }

  private final val BpeSep = '\u0001'

  /** BPE symbol-state init: one symbol per Unicode CODE POINT, joined
    * by the  separator (which can never appear inside a symbol).
    * Code points — not Java chars — so the contract matches SQL
    * engines that split by character. */
  def bpeInitSymbols(w: UTF8String): UTF8String = {
    val s = w.toString
    val sb = new java.lang.StringBuilder(s.length * 2)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (i > 0) sb.append(BpeSep)
      sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** One BPE merge round over a -joined symbol string: replace
    * every LEFTMOST-GREEDY non-overlapping adjacent (a, b) occurrence
    * with the concatenation a||b. The fold appends symbol c directly
    * (no separator) when the accumulated last symbol is exactly `a`
    * and c = b — a just-merged token can never equal `a` again (it is
    * strictly longer), so no merged-flag is needed; the SQL oracle
    * replays the identical fold. */
  def bpeMergeStep(s: UTF8String, a: String, b: String): UTF8String = {
    val syms = s.toString.split(BpeSep)
    val sb = new java.lang.StringBuilder(s.numChars() + 1)
    var lastStart = 0 // char offset of the last symbol inside sb
    var i = 0
    while (i < syms.length) {
      val c = syms(i)
      val lastIsA = sb.length() > 0 &&
        sb.length() - lastStart == a.length &&
        sb.indexOf(a, lastStart) == lastStart
      if (lastIsA && c == b) {
        sb.append(c) // merge: last symbol becomes a||b
      } else {
        if (sb.length() > 0) { sb.append(BpeSep); lastStart = sb.length() }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Apply a TRAINED BPE merge list to raw text: tokenize on ASCII
    * whitespace, init each word per code point, then replay every
    * merge in training order (same leftmost-greedy fold as
    * [[bpeMergeStep]]). `mergePairs` is the flattened
    * [a₁, b₁, a₂, b₂, …] array riding the plan as a reference object.
    * One row in, the word-concatenated subtoken array out — the
    * train-once / tokenize-everything production path. */
  def bpeApplyAll(text: UTF8String, mergePairs: Array[String]): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWsChar(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWsChar(s.charAt(i))) i += 1
        val w = s.substring(start, i)
        // init: one symbol per code point
        var syms = {
          val cps = w.codePoints().toArray
          val a = new Array[String](cps.length)
          var p = 0
          while (p < cps.length) { a(p) = new String(cps, p, 1); p += 1 }
          a
        }
        var m = 0
        while (m + 1 < mergePairs.length) {
          val a = mergePairs(m)
          val b = mergePairs(m + 1)
          if (syms.length >= 2) {
            val buf = new Array[String](syms.length)
            var n = 0
            var p = 0
            while (p < syms.length) {
              if (p + 1 < syms.length && syms(p) == a && syms(p + 1) == b) {
                buf(n) = a + b; n += 1; p += 2
              } else { buf(n) = syms(p); n += 1; p += 1 }
            }
            syms = java.util.Arrays.copyOf(buf, n)
          }
          m += 2
        }
        var p = 0
        while (p < syms.length) {
          out.add(UTF8String.fromString(syms(p))); p += 1
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  // shared seeded PRF for the augmentation kernels: the two-round
  // quadratic congruential mix over p = 2^31−1 (same family as the
  // sign-projection hash — a plain multiplicative hash is affine in
  // its inputs and correlates across positions). Exact int64, SQL-
  // replayable.
  def augPrf(id: Long, i: Long, seed: Long): Long = {
    var x = (id * 1315423911L + i * 2654435761L + seed * 2246822519L +
      54321L) % 2147483647L
    x = (x * x + x + 41L) % 2147483647L
    x = (x * x + x + 41L) % 2147483647L
    x
  }

  /** Deterministic word dropout: token i of document `id` is dropped
    * iff augPrf(id, i, seed) < threshold (threshold = ⌊rate·(2³¹−1)⌋,
    * computed once). Survivors re-join with single spaces — whitespace
    * runs normalize, which is part of the contract. Reproducible:
    * membership is a pure function of (id, position, seed), so re-runs
    * and engines agree token-for-token. */
  def wordDropout(id: Long, text: UTF8String, threshold: Long, seed: Long): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var tok = 0L
    while (i < s.length) {
      while (i < s.length && isWsChar(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWsChar(s.charAt(i))) i += 1
        if (augPrf(id, tok, seed) >= threshold) {
          if (sb.length() > 0) sb.append(' ')
          sb.append(s, start, i)
        }
        tok += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Block-deterministic span corruption (the T5 denoising objective
    * re-expressed for distributed reproducibility): tokens partition
    * into fixed blocks of `blockLen`; block b of document `id` is
    * masked iff augPrf(id, b, seed) < threshold. In the CORRUPTED
    * text a masked block collapses to the sentinel `<extra_id_b>`; the
    * TARGET is the concatenation of every masked block's sentinel
    * followed by its original tokens. Sentinels carry the BLOCK index
    * (not a running counter) — that keeps the construction a pure
    * per-block function, replayable by plain SQL list comprehensions
    * with no sequential fold.
    * Returns the corrupted text and the target joined by the U+0001
    * separator (the caller splits into two columns). */
  def spanCorrupt(id: Long, text: UTF8String, blockLen: Int,
      threshold: Long, seed: Long): UTF8String = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWsChar(s.charAt(i))) i += 1
      if (i < s.length) {
        val start = i
        while (i < s.length && !isWsChar(s.charAt(i))) i += 1
        toks.add(s.substring(start, i))
      }
    }
    val out = new java.lang.StringBuilder(s.length)
    val tgt = new java.lang.StringBuilder()
    var b = 0
    var t = 0
    while (t < toks.size()) {
      val end = math.min(t + blockLen, toks.size())
      if (augPrf(id, b, seed) < threshold) {
        if (out.length() > 0) out.append(' ')
        out.append("<extra_id_").append(b).append('>')
        if (tgt.length() > 0) tgt.append(' ')
        tgt.append("<extra_id_").append(b).append('>')
        var k = t
        while (k < end) { tgt.append(' ').append(toks.get(k)); k += 1 }
      } else {
        var k = t
        while (k < end) {
          if (out.length() > 0) out.append(' ')
          out.append(toks.get(k))
          k += 1
        }
      }
      t = end
      b += 1
    }
    UTF8String.fromString(out.toString + BpeSep + tgt.toString)
  }

  /** Sign random projection (Johnson–Lindenstrauss / Achlioptas ±1):
    * y_j = (Σ_i s(i,j)·x_i) / √outDim, the sum strictly in ascending-i
    * order so the result is bit-reproducible on any engine (double
    * addition is order-dependent; +, /, √ are all IEEE
    * correctly-rounded). The sign matrix never materializes: s(i,j)
    * comes from the ENGINE-MIRRORABLE two-round quadratic congruential
    * PRF over p = 2^31−1
    * `x₀ = (i·1315423911 + j·2654435761 + seed·2246822519 + 12345) mod p;
    *  x ← (x² + x + 41) mod p  (twice)`,
    * sign = + iff x < 2^30 — every step fits exact 64-bit integers
    * (x < p so x² < 2^62), so a SQL oracle replays it verbatim. A
    * plain multiplicative hash is NOT enough here: it is affine in
    * (i, j), which makes projection ROWS nearly collinear (measured
    * row correlation up to 0.96); the quadratic rounds bring the max
    * inter-row correlation down to the random-matrix baseline. */
  def signProject(v: ArrayData, outDim: Int, seed: Long, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val inv = math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      i = 0
      while (i < n) {
        var h = (i.toLong * 1315423911L + j.toLong * 2654435761L +
          seed * 2246822519L + 12345L) % 2147483647L
        h = (h * h + h + 41L) % 2147483647L
        h = (h * h + h + 41L) % 2147483647L
        if (h < 1073741824L) acc += x(i) else acc -= x(i)
        i += 1
      }
      out(j) = acc / inv
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm). Pipeline per document:
    *
    *  1. rolling char-k-gram hashes over Unicode CODE POINTS with the
    *     engine-mirrorable poly-31 hash `h = fold(cp)(h·31 + cp) mod
    *     2^31` (the same convention as [[hashedBigramBuckets]] — a SQL
    *     oracle replays it in exact 64-bit arithmetic);
    *  2. a window of `w` consecutive hashes slides over the document;
    *     each window contributes its RIGHTMOST minimal hash (plain
    *     winnowing; ties to the right);
    *  3. the fingerprint set = distinct selected (position, hash)
    *     pairs packed as `pos · 2^31 + hash` (pos 1-based over k-gram
    *     starts, in code points), sorted ascending.
    *
    * Guarantee (the paper's): any shared substring of length
    * ≥ w + k − 1 code points yields at least one shared fingerprint
    * hash. Documents shorter than k code points have no k-grams →
    * empty; documents with fewer than w hashes use one window over
    * all of them.
    *
    * O(m) per doc: the sliding minimum runs on a monotone index deque
    * (pop-back on `≥` keeps the RIGHTMOST min at the front). */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31L + cps(i + j)) % 2147483648L; j += 1 }
      hs(i) = h
      i += 1
    }
    val win = math.min(w, m)
    val deque = new Array[Int](m) // indices, increasing hash front→back
    var head = 0
    var tail = 0 // exclusive
    val sel = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) {
        val p = deque(head)
        sel.add((p + 1).toLong * 2147483648L + hs(p))
      }
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** FastSS deletion neighborhood: every string reachable from `s` by
    * deleting up to `maxDist` code points, including `s` itself,
    * distinct, in BFS generation order (s, then 1-deletions by
    * position, then 2-deletions, …). Replaces the nested
    * transform/sequence/flatten/array_distinct HOF stack (interpreted,
    * ~|s|² boxed lambda calls per row at maxDist=1 and the measured
    * cost center of the fuzzy-join candidate stage); one fused loop
    * over a code-point array, first-occurrence dedup via a hash set.
    * Deletion is by CODE POINT to match Spark's `substr`/`length`
    * semantics (the HOF oracle) on non-BMP input. */
  def deletionVariants(s: UTF8String, maxDist: Int): ArrayData = {
    val str = s.toString
    // code-point array (surrogate pairs collapse to one element)
    val nCp = str.codePointCount(0, str.length)
    val cps = new Array[Int](nCp)
    var ci = 0
    var o = 0
    while (o < str.length) {
      val cp = str.codePointAt(o)
      cps(ci) = cp
      ci += 1
      o += Character.charCount(cp)
    }
    val out = new java.util.ArrayList[Any]()
    val seen = new java.util.HashSet[String]()
    seen.add(str)
    out.add(s)
    // frontier holds each level's DISTINCT variants as code-point
    // arrays (level-local dedup mirrors the HOF's per-level
    // array_distinct; `seen` mirrors the final one)
    var frontier = new java.util.ArrayList[Array[Int]]()
    frontier.add(cps)
    var level = 0
    while (level < maxDist) {
      val next = new java.util.ArrayList[Array[Int]]()
      val levelSeen = new java.util.HashSet[String]()
      var f = 0
      while (f < frontier.size()) {
        val parent = frontier.get(f)
        var del = 0
        while (del < parent.length) {
          val child = new Array[Int](parent.length - 1)
          System.arraycopy(parent, 0, child, 0, del)
          System.arraycopy(parent, del + 1, child, del, parent.length - 1 - del)
          val sb = new java.lang.StringBuilder(child.length + 2)
          var k = 0
          while (k < child.length) { sb.appendCodePoint(child(k)); k += 1 }
          val cs = sb.toString
          if (levelSeen.add(cs)) {
            next.add(child)
            if (seen.add(cs)) out.add(UTF8String.fromString(cs))
          }
          del += 1
        }
        f += 1
      }
      frontier = next
      level += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Fixed-point log2 of the rational num/den (0 < num ≤ den), in
    * units of 2⁻³⁰: returns e·2³⁰ + f where e = ⌊log2(num/den)⌋ and f
    * holds 30 binary fraction digits extracted by the classic
    * squaring algorithm — ALL in exact integer arithmetic (normalize
    * num by doubling, fixed-point mantissa m with 2³¹ = 1.0, each
    * step m ← ⌊m²/2³¹⌋ then halve if ≥ 2), so the value is
    * bit-reproducible on ANY engine: no libm, no transcendental —
    * the mechanism that lets log-domain scores (LM fluency, DSIR
    * weights) be hash-oracled where `ln` cannot (it differs in the
    * last ulp between libms; see the q_lm_score contract). The
    * truncation drift of the 30-step fixed-point loop is part of the
    * CONTRACT — an oracle replays the identical loop and lands on the
    * identical integer. Monotone in num/den (up to the shared 2⁻³⁰
    * quantization), which is all ranking needs. */
  def log2Fix(num: Long, den: Long): Long = {
    require(num > 0 && den > 0 && num <= den,
      s"log2Fix needs 0 < num <= den, got $num/$den")
    var e = 0L
    var n = num
    while (n < den) { n <<= 1; e -= 1 }
    // m0 = floor(n * 2^31 / den) in [2^31, 2^32); the shifted product
    // overflows Long once n reaches 2^32 — counts that large take the
    // exact wide division (same integer either way)
    var m: Long =
      if (n <= 0xFFFFFFFFL) (n << 31) / den
      else ((BigInt(n) << 31) / BigInt(den)).toLong
    var f = 0L
    var i = 0
    while (i < 30) {
      // m < 2^32 so the unsigned 64-bit product is exact in the
      // wrapped Long; >>> keeps the unsigned semantics
      val m2 = (m * m) >>> 31            // in [2^31, 2^33)
      val b = m2 >>> 32                  // 0 or 1
      m = m2 >> b
      f = (f << 1) | b
      i += 1
    }
    e * (1L << 30) + f
  }

  /** Probe-side bloom membership: false = definitely absent (safe to
    * prune), true = possibly present (exact join decides). Same probe
    * sequence as [[bloomSet]]; runs inside whole-stage codegen. */
  def bloomMightContain(bits: Array[Byte], hash: Long, k: Int): Boolean = {
    val mBits = bits.length.toLong * 8L
    val mask = mBits - 1L
    val h2 = bloomH2(hash)
    var i = 0
    var h = hash
    while (i < k) {
      val pos = h & mask
      if ((bits((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      h += h2
      i += 1
    }
    true
  }
}
