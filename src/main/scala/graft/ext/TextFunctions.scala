package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, n-gram shingling, language ID, quality
  * scoring, token counting, fingerprinting.
  *
  * Hot-path note: Catalyst's higher-order array functions (`filter`,
  * `transform`, `aggregate`) are CodegenFallback — interpreted, ~10×
  * slower than a compiled Scala UDF in a tight scan (measured on the
  * dedup pipelines, see Dedup.shingleFn). Every per-row text kernel here
  * is therefore a COMPILED function behind a UDF boundary: one
  * tokenization per call, primitive loops, no Catalyst lambda
  * interpretation. The surrounding plan stays whole-stage codegen'd;
  * only the kernel call itself crosses the UDF boundary (the next rung —
  * a native Expression with doGenCode — buys back the boxing only, which
  * for these string kernels is noise next to the regex split).
  *
  * Every function has an exactly-equivalent DuckDB SQL form (used by the
  * correctness oracles), which pins the semantics engine-independently;
  * SCALE.md records the measured interpreted-HOF → compiled-kernel
  * speedup.
  */
object TextFunctions {

  /** Tokenizer kernel: lowercased alphanumeric runs, empties removed.
    * Identical to `filter(split(lower(c), "[^a-z0-9]+"), _ =!= "")`
    * (Spark's split is Java-regex with limit -1; leading/trailing
    * empties are filtered on both paths) and to DuckDB's
    * list_filter(regexp_split_to_array(lower(c), '[^a-z0-9]+'),
    * x -> x <> ''). */
  private[graft] val tokenizeFn: String => Seq[String] = text =>
    if (text == null) null
    else {
      val out = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      // ArraySeq wrap, no copy; Spark encodes Seq[String] natively.
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  private val tokensUdf = udf(tokenizeFn)

  /** Lowercased alphanumeric tokens, empties removed. */
  def tokens(c: Column): Column = tokensUdf(c)

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Whitespace+punctuation token count (alnum runs). Null text → null
    * (as size(null) under non-legacy sizeOfNull). */
  def tokenCount(c: Column): Column =
    udf((text: String) =>
      if (text == null) None else Some(tokenizeFn(text).length)).apply(c)

  /** Distinct-token count — fused tokenize+dedup kernel. */
  def distinctTokenCount(c: Column): Column =
    udf((text: String) =>
      if (text == null) None
      else Some(tokenizeFn(text).distinct.length)).apply(c)

  /** BPE-ish token count: segments the lowercased text the way byte-pair
    * pre-tokenizers do — optional leading space glued to letter runs,
    * digit runs, and symbol runs each count as one token (the GPT-2
    * pre-tokenizer shape, simplified to a dialect-portable regex).
    * Stays a native Catalyst regex (RegExpExtractAll IS codegen'd, only
    * the array HOFs are not). DuckDB equivalent:
    * len(regexp_extract_all(lower(c), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')). */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0)))

  /** Word n-gram shingles (distinct), the dedup unit. For a token array
    * t of size s: shingle i = t[i] ' ' t[i+1] ... t[i+n-1] (docs shorter
    * than n shingle to []). Same kernel family as Dedup.shingleFn. */
  def shingles(tok: Column, n: Int = 3): Column =
    udf((toks: Seq[String]) =>
      if (toks == null) null
      else if (toks.length < n) Seq.empty[String]
      else toks.sliding(n).map(_.mkString(" ")).distinct.toSeq).apply(tok)

  /** Fused text → distinct n-gram shingles (one tokenize, no
    * intermediate array column). */
  def shinglesOfText(c: Column, n: Int = 3): Column =
    udf((text: String) =>
      if (text == null) null
      else {
        val toks = tokenizeFn(text)
        if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).distinct.toSeq
      }).apply(c)

  /** Language-ID by marker-word voting: score per language = number of
    * tokens that are that language's stopword markers; argmax with a
    * fixed priority order on ties; no hits → 'und'. A classic n-gram/
    * stopword heuristic kept deliberately SQL-expressible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "como", "para"))

  private val markerSets: Array[(String, Set[String])] =
    langMarkers.map { case (l, ms) => l -> ms.toSet }.toArray

  /** Marker-hit count over a token array (spec/composition surface;
    * langId fuses this per-language loop into one kernel). */
  def langScore(tok: Column, markers: Seq[String]): Column = {
    val set = markers.toSet
    udf((toks: Seq[String]) =>
      if (toks == null) None else Some(toks.count(set))).apply(tok)
  }

  /** One fused kernel: tokenize once, count all four marker sets, argmax
    * with declaration-order tie priority; zero hits (or null text) →
    * 'und' — exactly the semantics of the when-chain over langScores. */
  def langId(c: Column): Column =
    udf((text: String) => {
      if (text == null) "und"
      else {
        val toks = tokenizeFn(text)
        val scores = new Array[Int](markerSets.length)
        toks.foreach { t =>
          var i = 0
          while (i < markerSets.length) {
            if (markerSets(i)._2.contains(t)) scores(i) += 1
            i += 1
          }
        }
        var best = 0; var bestIdx = -1; var i = 0
        while (i < markerSets.length) {
          // strict > keeps the FIRST language on ties (priority order)
          if (scores(i) > best) { best = scores(i); bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) "und" else markerSets(bestIdx)._1
      }
    }).apply(c)

  /** Quality metrics: lengths + punctuation/stopword/uppercase ratios.
    * All single-division doubles over integer counts — bit-identical
    * across engines (no summation-order drift). */
  def nChars(c: Column): Column = length(c)

  /** Punctuation ratio — native Catalyst regex (codegen'd; character
    * counts are codepoints, matching Spark `length`). */
  def punctRatio(c: Column): Column =
    when(length(c) > 0,
      (length(c) - length(regexp_replace(c, "[\\.,;:!\\?]", ""))).cast("double")
        / length(c)).otherwise(lit(0.0))

  private val allStops: Set[String] = langMarkers.flatMap(_._2).toSet

  /** Stopword-token ratio; empty/null token stream → 0.0 (mirrors the
    * when/otherwise of the HOF form). */
  def stopwordRatio(c: Column): Column =
    udf((text: String) => {
      val toks = if (text == null) null else tokenizeFn(text)
      if (toks == null || toks.isEmpty) 0.0
      else toks.count(allStops).toDouble / toks.length
    }).apply(c)

  /** Number of DISTINCT stopword-marker tokens present — the counter
    * behind the Gopher "contains ≥ 2 stop words" document rule. Uses
    * the engine's 32-marker stop list (langMarkers, all languages);
    * null text → 0. */
  def distinctStopwordCount(c: Column): Column =
    udf((text: String) => {
      val toks = if (text == null) null else tokenizeFn(text)
      if (toks == null) 0
      else {
        val seen = new java.util.HashSet[String]()
        toks.foreach(t => if (allStops(t)) seen.add(t))
        seen.size
      }
    }).apply(c)

  /** Mean token length; empty/null token stream → 0.0. Sum as Long then
    * one double division — same op order as the aggregate-HOF form and
    * the DuckDB oracle (list_sum / len). */
  def meanTokenLen(c: Column): Column =
    udf((text: String) => {
      val toks = if (text == null) null else tokenizeFn(text)
      if (toks == null || toks.isEmpty) 0.0
      else {
        var s = 0L
        toks.foreach(t => s += t.length)
        s.toDouble / toks.length
      }
    }).apply(c)

  /** Composite quality score in [0,1]: rewards mid-length docs and real
    * word structure, penalizes punctuation soup. Weights are engine
    * policy (no reference analog — net-new per the build mandate).
    * lenScore/wordScore share ONE tokenize in a fused kernel; punctRatio
    * stays the native regex column. IEEE op order matches the previous
    * column form exactly (min(n/50, 1), 1 - pr, min(mtl/8, 1), weighted
    * sum left-to-right). */
  def qualityScore(c: Column): Column = {
    val lenAndWord = udf((text: String) => {
      val toks = if (text == null) null else tokenizeFn(text)
      if (toks == null || toks.isEmpty) (0.0, 0.0)
      else {
        var s = 0L
        toks.foreach(t => s += t.length)
        val lenScore = math.min(toks.length.toDouble / 50.0, 1.0)
        val wordScore = math.min((s.toDouble / toks.length) / 8.0, 1.0)
        (lenScore, wordScore)
      }
    }).apply(c)
    val structScore = lit(1.0) - punctRatio(c)
    graft.functions.DetRound.det6(
      lenAndWord.getField("_1") * 0.5 + structScore * 0.3 +
        lenAndWord.getField("_2") * 0.2)
  }

  /** Content fingerprint: md5 over the normalized token stream. Robust
    * to case/punctuation/whitespace changes; identical in DuckDB as
    * md5(array_to_string(tokens, ' ')). The join is fused into the
    * kernel; md5 stays the native (codegen'd) expression. */
  def fingerprint(c: Column): Column =
    md5(udf((text: String) =>
      if (text == null) null else tokenizeFn(text).mkString(" ")).apply(c))

  /** Repetition-quality signals (the Gopher/RefinedWeb document-level
    * repetitiveness filters, token-gram flavor):
    *   - `dupTrigramFrac`: fraction of trigram OCCURRENCES whose
    *     trigram occurs more than once in the doc (machine-generated /
    *     boilerplate text scores high);
    *   - `topBigramFrac`: occurrences of the single most frequent
    *     bigram over all bigram occurrences (loops/listicles score
    *     high).
    * Both are row-local compiled kernels (one tokenize, open-addressed
    * count map), return 0.0 for null text and for docs too short to form
    * the gram (a doc with no grams has zero repetition — the same
    * convention the DuckDB oracle's LEFT JOIN + coalesce encodes), and
    * round 6dp for cross-engine hash parity. */
  private[graft] val dupTrigramFracFn: String => java.lang.Double = {
    text: String =>
      if (text == null) java.lang.Double.valueOf(0.0)
      else {
        val toks = tokenizeFn(text)
        if (toks.length < 3) java.lang.Double.valueOf(0.0)
        else {
          val counts = new java.util.HashMap[String, Int]()
          var i = 0
          while (i < toks.length - 2) {
            val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
            counts.merge(g, 1, Integer.sum)
            i += 1
          }
          var dup = 0L
          val it = counts.values().iterator()
          while (it.hasNext) { val n = it.next(); if (n > 1) dup += n }
          val raw = dup.toDouble / (toks.length - 2).toDouble
          java.lang.Double.valueOf(math.floor(raw * 1e6 + 0.5) / 1e6)
        }
      }
  }

  private[graft] val topBigramFracFn: String => java.lang.Double = {
    text: String =>
      if (text == null) java.lang.Double.valueOf(0.0)
      else {
        val toks = tokenizeFn(text)
        if (toks.length < 2) java.lang.Double.valueOf(0.0)
        else {
          val counts = new java.util.HashMap[String, Int]()
          var i = 0
          while (i < toks.length - 1) {
            counts.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
            i += 1
          }
          var mx = 0
          val it = counts.values().iterator()
          while (it.hasNext) { val n = it.next(); if (n > mx) mx = n }
          val raw = mx.toDouble / (toks.length - 1).toDouble
          java.lang.Double.valueOf(math.floor(raw * 1e6 + 0.5) / 1e6)
        }
      }
  }

  def dupTrigramFrac(c: Column): Column = udf(dupTrigramFracFn).apply(c)

  def topBigramFrac(c: Column): Column = udf(topBigramFracFn).apply(c)

  /** Fixed-size overlapping character chunks — the RAG/embedding prep
    * unit (TokenPacker is the training-side complement that packs by
    * token budget; this slices by character window for retrieval
    * indexing). Chunk i covers [i·step, i·step + size) with
    * step = size − overlap; the last chunk may be shorter; a doc always
    * yields ≥ 1 chunk (empty/null text → one empty chunk — total, like
    * the rest of the kernel family). Row-local compiled kernel;
    * count = max(1, 1 + ceil((len − size) / step)), replicated exactly
    * by the DuckDB oracle via substr over a range.
    *
    * Lengths and offsets are Unicode CODEPOINTS, not UTF-16 code units —
    * DuckDB's len()/substr() count codepoints, so a code-unit kernel
    * would diverge on any non-BMP text (emoji, rare CJK). The walk is a
    * single forward pass (offsetByCodePoints from the previous
    * boundary), so cost stays O(len) per row. */
  private[graft] def chunkFn(size: Int, overlap: Int): String => Seq[(Int, Int, String)] = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    text: String => {
      val t = if (text == null) "" else text
      val cpLen = t.codePointCount(0, t.length)
      val n =
        if (cpLen <= size) 1
        else 1 + ((cpLen - size + step - 1) / step)
      val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, String)](n)
      var startCu = 0 // code-unit index of chunk i's first codepoint
      var i = 0
      while (i < n) {
        val remaining = cpLen - i * step
        val endCu = t.offsetByCodePoints(startCu, math.min(size, remaining))
        out += ((i, i * step, t.substring(startCu, endCu)))
        i += 1
        if (i < n) startCu = t.offsetByCodePoints(startCu, step)
      }
      out.toSeq
    }
  }

  /** Array of (chunk_idx, chunk_start, chunk_text) structs. */
  def chunks(c: Column, size: Int = 200, overlap: Int = 40): Column =
    udf(chunkFn(size, overlap)).apply(c)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Rolling-window document fingerprints — winnowing (Schleimer,
    * Wilkerson & Aiken, SIGMOD 2003; the MOSS scheme). The normalized
    * text (lowercase, whitespace runs → one space) is hashed as
    * overlapping char k-grams; every sliding window of `w` consecutive
    * gram hashes contributes its minimum; the result is the sorted
    * DISTINCT set of window minima. Winnowing's guarantee carries over:
    * any substring match of length ≥ w+k-1 between two docs produces at
    * least one shared fingerprint, and density is ~2/(w+1) of grams.
    * (Positional tie-break bookkeeping affects only which POSITION is
    * charged, never the selected hash value, so a value-set is
    * tie-break-free and is what a fingerprint index stores anyway.)
    *
    * Gram hash = first 15 hex chars of md5 (a nonnegative 60-bit long) —
    * the repo's portable derivation, so DuckDB reproduces the set with
    * `min() OVER (... ROWS w-1 PRECEDING)` + DISTINCT over
    * `CAST(('0x' || substr(md5(substr(t,i,k)),1,15)) AS BIGINT)`.
    * Texts with fewer than w grams use one whole-text window; texts
    * shorter than k chars have no fingerprints (empty array). Indexing
    * parity note: the kernel is UTF-16 code-unit based while SQL twins
    * are codepoint based — identical on BMP-only text (all of this
    * corpus); non-BMP corpora need a codepoint-stepping gram loop.
    *
    * Row-local compiled kernel: O(len) hashing + an O(len) monotonic
    * deque for the window minima — no shuffle; the candidate-pair stage
    * downstream is a plain explode + equi-join on the fingerprint
    * value, the same bucket-join shape as MinHash LSH. */
  private[graft] def winnowFn(k: Int, w: Int): String => Array[Long] = {
    text: String =>
      if (text == null) null
      else {
        // explicit whitespace class, NOT \s: Java \s and RE2 \s disagree
        // on vertical tab (\x0B), and the oracle must see the same gram
        // stream — both sides pin [ \t\n\x0B\f\r] (ASCII whitespace).
        val t = text.toLowerCase.replaceAll("[ \\t\\n\\u000B\\f\\r]+", " ")
        val m = t.length - k + 1
        if (m <= 0) Array.empty[Long]
        else {
          val md = md5Local.get()
          val h = new Array[Long](m)
          var i = 0
          while (i < m) {
            val d = md.digest(t.substring(i, i + k).getBytes("UTF-8"))
            // first 15 hex chars = bytes 0-6 plus the high nibble of
            // byte 7: a 60-bit nonnegative value (sign-safe ordering)
            var v = 0L
            var j = 0
            while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
            h(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
            i += 1
          }
          val sel = new java.util.HashSet[java.lang.Long]()
          val dq = new java.util.ArrayDeque[Int]() // indices, h increasing
          i = 0
          while (i < m) {
            while (!dq.isEmpty && h(dq.peekLast()) >= h(i)) dq.pollLast()
            dq.addLast(i)
            while (dq.peekFirst() <= i - w) dq.pollFirst()
            // full windows end at i >= w-1; an m<w text has one
            // whole-text window, emitted at its last gram
            if (i >= w - 1 || i == m - 1) sel.add(h(dq.peekFirst()))
            i += 1
          }
          val out = new Array[Long](sel.size())
          val it = sel.iterator()
          i = 0
          while (it.hasNext) { out(i) = it.next(); i += 1 }
          java.util.Arrays.sort(out)
          out
        }
      }
  }

  /** Sorted distinct winnowing fingerprint set of the text column. */
  def winnowFingerprints(c: Column, k: Int = 8, w: Int = 8): Column =
    udf(winnowFn(k, w)).apply(c)
}
