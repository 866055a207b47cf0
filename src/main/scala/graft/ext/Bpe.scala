package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic BPE-style subword tokenizer over a PINNED merges
  * table — the production token-counting quantity for packing budgets
  * (TokenPacker) and curation stats, where an alnum-word count is only
  * a proxy. (ref: oarphpy has no tokenizer; this is an engine-added
  * training-pipeline operator. The merge list is a small hand-pinned
  * English-bigram vocabulary, NOT a trained artifact — the point is the
  * kernel + oracle machinery; swapping in a real learned merges file is
  * a data change, not a code change.)
  *
  * Encoding semantics (pinned, replayed exactly by the SQL oracle):
  * a word (one `[a-z0-9]+` token of the house tokenizer convention) is
  * split into single-character symbols; each merge rule (a, b) → ab is
  * applied IN TABLE ORDER, each run to fixpoint with leftmost-first
  * scanning, before the next rule is considered.
  *
  * Oracle-parity invariant: every rule has a ≠ b (checked at class
  * load). Consequence: within one rule, occurrences of the adjacent
  * pair (a, b) in the symbol string are pairwise DISJOINT (an overlap
  * would force a = b), and merging one occurrence can never create or
  * destroy another (the merged symbol ab differs from both a and b, and
  * its neighbors are unchanged) — so the rewriting is confluent and ANY
  * merge order reaches the same normal form. That makes the compiled
  * kernel's single forward scan bit-identical to the oracle's
  * `replace('|a|b|' → '|ab|')`-until-unchanged loop over a
  * delimiter-framed symbol string, despite their different scan orders.
  * (With a = b the two diverge — e.g. rule (a,a) on "a a a a a" — which
  * is why the invariant is load-checked, not just documented.)
  *
  * Scale shape: pure row-local kernel (a per-task word memo absorbs the
  * Zipfian repeat factor), no shuffle, no state — map-side at any scale.
  */
object Bpe {

  /** Pinned merge rules, highest priority first. Multi-level on
    * purpose (t+h → th, th+e → the; i+n → in, in+g → ing) so the
    * priority ordering is genuinely exercised. */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", // th, the
    "i" -> "n", "in" -> "g", // in, ing
    "a" -> "n", "an" -> "d", // an, and
    "e" -> "r", "r" -> "e",
    "o" -> "n", "o" -> "r", "o" -> "f", "o" -> "u",
    "a" -> "t", "a" -> "l",
    "e" -> "n", "e" -> "s", "e" -> "d", "e" -> "a",
    "i" -> "s", "i" -> "t",
    "s" -> "t", "t" -> "o", "t" -> "i", "h" -> "a")

  // The confluence invariant the oracle replay depends on (see doc).
  require(merges.forall { case (a, b) => a != b },
    "BPE merge rules must have left != right for oracle parity")

  /** Encode one word: char symbols, then each rule in order to
    * fixpoint. Forward scan without post-merge backtracking is
    * complete because a merge can never create a new occurrence of the
    * SAME rule (ab ∉ {a, b}). */
  private[graft] def encodeWord(w: String): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = 0
    while (ci < w.length) { syms += String.valueOf(w.charAt(ci)); ci += 1 }
    merges.foreach { case (a, b) =>
      var i = 0
      while (i < syms.length - 1) {
        if (syms(i) == a && syms(i + 1) == b) {
          syms(i) = a + b
          syms.remove(i + 1)
        } else i += 1
      }
    }
    syms.toArray
  }

  private def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Total BPE token count of a doc. The per-instance memo is scoped to
    * the deserialized task closure (no cross-thread sharing) and
    * exploits the Zipfian word distribution: encode each distinct word
    * once per task. */
  private[graft] def countFn: String => Long = {
    val memo = new java.util.HashMap[String, java.lang.Integer]()
    text => {
      var total = 0L
      val ws = tokenize(text)
      var i = 0
      while (i < ws.length) {
        val w = ws(i)
        var n = memo.get(w)
        if (n == null) {
          n = Integer.valueOf(encodeWord(w).length)
          memo.put(w, n)
        }
        total += n.intValue()
        i += 1
      }
      total
    }
  }

  /** The doc's FIRST word encoded, space-joined ("" for wordless docs) —
    * pins actual token BOUNDARIES in the oracle, not just counts. */
  private[graft] def headEncFn: String => String = { text =>
    val ws = tokenize(text)
    if (ws.isEmpty) "" else encodeWord(ws(0)).mkString(" ")
  }

  def bpeTokenCount(c: Column): Column = udf(countFn).apply(c)

  def bpeHeadEncoding(c: Column): Column = udf(headEncFn).apply(c)
}
