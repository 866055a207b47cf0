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

  /** Encode one word under the PINNED table (delegates to
    * [[encodeWith]] — one kernel, two tables can never drift). */
  private[graft] def encodeWord(w: String): Array[String] =
    encodeWith(merges, w)

  private def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Memoized total-token-count closure under `table`. The
    * per-instance memo is scoped to the deserialized task closure (no
    * cross-thread sharing) and exploits the Zipfian word distribution:
    * encode each distinct word once per task. */
  private def memoizedCountFn(
      table: Seq[(String, String)]): String => Long = {
    val memo = new java.util.HashMap[String, java.lang.Integer]()
    text => {
      var total = 0L
      val ws = tokenize(text)
      var i = 0
      while (i < ws.length) {
        val w = ws(i)
        var n = memo.get(w)
        if (n == null) {
          n = Integer.valueOf(encodeWith(table, w).length)
          memo.put(w, n)
        }
        total += n.intValue()
        i += 1
      }
      total
    }
  }

  private[graft] def countFn: String => Long = memoizedCountFn(merges)

  /** The doc's FIRST word encoded, space-joined ("" for wordless docs) —
    * pins actual token BOUNDARIES in the oracle, not just counts. */
  private[graft] def headEncFn: String => String = { text =>
    val ws = tokenize(text)
    if (ws.isEmpty) "" else encodeWord(ws(0)).mkString(" ")
  }

  def bpeTokenCount(c: Column): Column = udf(countFn).apply(c)

  def bpeHeadEncoding(c: Column): Column = udf(headEncFn).apply(c)

  /** Encode one word under an ARBITRARY merges table — THE kernel
    * (`encodeWord` is its pinned-table specialization): char symbols,
    * then each rule in table order, each to fixpoint. Forward scan
    * without post-merge backtracking is complete because a merge can
    * never create a new occurrence of the SAME rule (ab ∉ {a, b}). */
  private[graft] def encodeWith(
      table: Seq[(String, String)], w: String): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var ci = 0
    while (ci < w.length) { syms += String.valueOf(w.charAt(ci)); ci += 1 }
    table.foreach { case (a, b) =>
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

  /** TRAIN a merges table from a corpus — the missing half of the BPE
    * story (the pinned table above is the apply-side fixture; real
    * pipelines learn the merges from their own data, SentencePiece
    * style).
    *
    * Scale shape (the surprisal/k-means recipe): ONE distributed
    * word-count aggregate, hard-capped at the top `maxVocab` words via
    * TakeOrdered (deterministic count-desc, word-asc tie-break), then
    * the classic sequential BPE loop runs DRIVER-SIDE over that bounded
    * (word, count) table — zero per-merge Spark jobs, driver state
    * O(maxVocab), corpus never rescanned. Training quality saturates on
    * the capped vocabulary exactly like the surprisal LM (the dropped
    * tail is singleton words whose pair counts are noise).
    *
    * Determinism (engine-portable): pair selection is max count with
    * lexicographic (left, right) tie-break; training stops early when
    * the best pair count is 1 (merging hapax pairs memorizes noise).
    * Every emitted rule has left != right when `skipSelfPairs` (the
    * default) — keeping the trained table inside the confluence
    * invariant the SQL oracle replay machinery requires (an (a, a) rule
    * is order-sensitive; see the object scaladoc). */
  def trainMerges(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxVocab: Int = 200000,
      skipSelfPairs: Boolean = true): Seq[(String, String)] = {
    import org.apache.spark.sql.functions.{col, count, explode, lit, lower,
      split => fsplit}
    val words = df
      .select(explode(fsplit(lower(col(textCol)), "[^a-z0-9]+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      // TakeOrderedAndProject: one job, O(maxVocab) to the driver.
      .orderBy(col("n").desc, col("w").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // Driver-side classic BPE over the bounded vocab.
    val syms = words.map { case (w, _) =>
      val a = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) { a += String.valueOf(w.charAt(i)); i += 1 }
      a
    }
    val counts = words.map(_._2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val c = counts(wi)
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          if (!(skipSelfPairs && p._1 == p._2))
            pairCounts.merge(p, c, java.lang.Long.sum(_, _))
          i += 1
        }
        wi += 1
      }
      var best: (String, String) = null
      var bestN = 1L // stop below 2: hapax pairs are noise
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val better = e.getValue > bestN ||
          (e.getValue == bestN && best != null && {
            val c = e.getKey._1.compareTo(best._1)
            c < 0 || (c == 0 && e.getKey._2.compareTo(best._2) < 0)
          })
        if (better) { best = e.getKey; bestN = e.getValue }
      }
      if (best == null) exhausted = true
      else {
        out += best
        val (a, b) = best
        var wj = 0
        while (wj < syms.length) {
          val s = syms(wj)
          var i = 0
          while (i < s.length - 1) {
            if (s(i) == a && s(i + 1) == b) {
              s(i) = a + b
              s.remove(i + 1)
            } else i += 1
          }
          wj += 1
        }
      }
      m += 1
    }
    out.toSeq
  }

  /** Column form of the trained model: token count under `table`
    * (the same memoized row-local kernel as the pinned-table path). */
  def tokenCountWith(table: Seq[(String, String)])(c: Column): Column =
    udf(memoizedCountFn(table)).apply(c)
}
