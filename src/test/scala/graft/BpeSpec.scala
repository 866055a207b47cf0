package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ext.Bpe

/** BPE kernel: pinned semantics + differential parity with the SQL
  * oracle's replace-to-fixpoint formulation (Java String.replace has
  * the same all-non-overlapping-left-to-right contract as DuckDB's
  * replace(), so this mirrors the oracle exactly). */
class BpeSpec extends AnyFunSuite {

  test("multi-level merges compose in priority order") {
    assert(Bpe.encodeWord("the").toSeq == Seq("the")) // t+h, th+e
    assert(Bpe.encodeWord("ing").toSeq == Seq("ing")) // i+n, in+g
    assert(Bpe.encodeWord("and").toSeq == Seq("and")) // a+n, an+d
    assert(Bpe.encodeWord("thethe").toSeq == Seq("the", "the"))
    // (a,n) fires before (a,t): "ant" -> [an, t], never [a, nt]
    assert(Bpe.encodeWord("ant").toSeq == Seq("an", "t"))
    assert(Bpe.encodeWord("hello").toSeq ==
      Seq("h", "e", "l", "l", "o")) // no rule applies
    assert(Bpe.encodeWord("").toSeq == Seq.empty)
  }

  test("counts and head encoding are total and consistent") {
    val count = Bpe.countFn
    val head = Bpe.headEncFn
    assert(count(null) == 0L && head(null) == "")
    assert(count("") == 0L && head("") == "")
    assert(count("?!") == 0L && head("?!") == "")
    assert(count("The the THE") == 3L)
    assert(head("Thinking, fast and slow") ==
      Bpe.encodeWord("thinking").mkString(" "))
    // memoized path equals fresh-encode path
    val doc = "the and the and ing ing the"
    assert(count(doc) ==
      doc.split(" ").map(w => Bpe.encodeWord(w).length.toLong).sum)
  }

  /** The oracle's formulation: delimiter-framed string, each rule run
    * to replace()-fixpoint in table order. */
  private def oracleEncode(w: String): Seq[String] = {
    var s = "|" + w.flatMap(c => s"$c|")
    Bpe.merges.foreach { case (a, b) =>
      var changed = true
      while (changed) {
        val next = s.replace(s"|$a|$b|", s"|$a$b|")
        changed = next != s
        s = next
      }
    }
    s.split('|').filter(_.nonEmpty).toSeq
  }

  test("kernel == oracle replace-to-fixpoint on random words") {
    val rng = new Random(2024)
    // alphabet weighted toward rule characters so merges actually fire
    val alphabet = "thethandinginoreresaltiou0binghat"
    (1 to 1000).foreach { trial =>
      val len = rng.nextInt(13)
      val w = (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString
      assert(Bpe.encodeWord(w).toSeq == oracleEncode(w),
        s"trial $trial word=$w")
      // reconstruction: concatenated tokens give back the word
      assert(Bpe.encodeWord(w).mkString == w, s"lossy encode of $w")
    }
  }
}
