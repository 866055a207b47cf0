package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, n-gram shingling, language ID, quality
  * scoring, token counting, fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * higher-order array functions — codegen'd, no UDF boundary — so the
  * whole pipeline stays inside whole-stage codegen on a 100 TB scan.
  * Every function has an exactly-equivalent DuckDB SQL form (used by the
  * correctness oracles), which pins the semantics engine-independently.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens, empties removed.
    * DuckDB equivalent: list_filter(regexp_split_to_array(lower(c),
    * '[^a-z0-9]+'), x -> x <> ''). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Whitespace+punctuation token count (alnum runs). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: segments the lowercased text the way byte-pair
    * pre-tokenizers do — optional leading space glued to letter runs,
    * digit runs, and symbol runs each count as one token (the GPT-2
    * pre-tokenizer shape, simplified to a dialect-portable regex).
    * DuckDB equivalent: len(regexp_extract_all(lower(c),
    * ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')). */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"), lit(0)))

  /** Word n-gram shingles (distinct), the dedup unit. For a token array
    * t of size s: shingle i = t[i] ' ' t[i+1] ... t[i+n-1], i = 1..s-n+1
    * (1-based, matching element_at). Docs shorter than n shingle to []. */
  def shingles(tok: Column, n: Int = 3): Column = {
    val joined = transform(
      sequence(lit(1), size(tok) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(tok, i + j)): _*))
    // sequence(1, k) is DESCENDING for k < 1 — guard short docs to [].
    when(size(tok) >= n, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

  /** Language-ID by marker-word voting: score per language = number of
    * tokens that are that language's stopword markers; argmax with a
    * fixed priority order on ties; no hits → 'und'. A classic n-gram/
    * stopword heuristic kept deliberately SQL-expressible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "como", "para"))

  def langScore(tok: Column, markers: Seq[String]): Column =
    size(filter(tok, t => t.isin(markers.map(lit): _*)))

  def langId(c: Column): Column = {
    val tok = tokens(c)
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(tok, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // Priority = declaration order on ties; zero hits → 'und'.
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality metrics: lengths + punctuation/stopword/uppercase ratios.
    * All single-division doubles over integer counts — bit-identical
    * across engines (no summation-order drift). */
  def nChars(c: Column): Column = length(c)
  def punctRatio(c: Column): Column =
    when(length(c) > 0,
      (length(c) - length(regexp_replace(c, "[\\.,;:!\\?]", ""))).cast("double")
        / length(c)).otherwise(lit(0.0))
  def stopwordRatio(c: Column): Column = {
    val tok = tokens(c)
    val stops = langMarkers.flatMap(_._2).distinct
    when(size(tok) > 0,
      size(filter(tok, t => t.isin(stops.map(lit): _*))).cast("double") / size(tok))
      .otherwise(lit(0.0))
  }
  def meanTokenLen(c: Column): Column = {
    val tok = tokens(c)
    when(size(tok) > 0,
      aggregate(tok, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(tok))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs and real
    * word structure, penalizes punctuation soup. Weights are engine
    * policy (no reference analog — net-new per the build mandate). */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 50.0, lit(1.0))
    val structScore = lit(1.0) - punctRatio(c)
    val wordScore = least(meanTokenLen(c) / 8.0, lit(1.0))
    graft.functions.DetRound.det6(lenScore * 0.5 + structScore * 0.3 + wordScore * 0.2)
  }

  /** Content fingerprint: md5 over the normalized token stream. Robust
    * to case/punctuation/whitespace changes; identical in DuckDB as
    * md5(array_to_string(tokens, ' ')). */
  def fingerprint(c: Column): Column = md5(concat_ws(" ", tokens(c)))
}
