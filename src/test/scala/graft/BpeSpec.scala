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

  /** Independent sequential BPE trainer (textbook formulation, no
    * shared code with the operator): word-frequency map → repeat:
    * count adjacent pairs, merge the (count desc, pair asc) max. */
  private def referenceTrain(
      wordCounts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] =
      wordCounts.map { case (w, c) => w.toList.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          if (p._1 != p._2) pairs(p) += c
        }
      }
      val candidates = pairs.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        out += best
        vocab = vocab.map { case (syms, c) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              merged += best._1 + best._2; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toList -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("trainMerges == independent sequential trainer on a real corpus") {
    val spark = SparkFixture.spark
    val docs = spark.read.parquet(s"${SparkFixture.sf0001}/documents.parquet")
    val got = Bpe.trainMerges(docs, "text", numMerges = 40)
    // reference computed from the same word counts, derived independently
    import org.apache.spark.sql.functions._
    val wc = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceTrain(wc, 40)
    assert(got == want)
    // trained tables satisfy the confluence invariant the oracle
    // machinery requires
    assert(got.forall { case (a, b) => a != b })
    // determinism across invocations
    assert(Bpe.trainMerges(docs, "text", numMerges = 40) == got)
    // the trained model encodes losslessly and compresses vs chars
    val sample = wc.keys.toSeq.sorted.take(200)
    sample.foreach { w =>
      assert(Bpe.encodeWith(got, w).mkString == w, s"lossy: $w")
    }
    val charLen = sample.map(_.length.toLong).sum
    val tokLen = sample.map(w => Bpe.encodeWith(got, w).length.toLong).sum
    assert(tokLen < charLen, "trained merges should compress the vocab")
    // the Column form of the trained model agrees with the kernel
    val viaCol = docs.select(
      org.apache.spark.sql.functions.sum(
        Bpe.tokenCountWith(got)(org.apache.spark.sql.functions.col("text"))))
      .collect()(0).getLong(0)
    val viaKernel = docs.select("text").collect()
      .map(r => Option(r.getString(0)).getOrElse(""))
      .map(t => t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(w => Bpe.encodeWith(got, w).length.toLong).sum).sum
    assert(viaCol == viaKernel)
  }

  test("trainMerges is capped: maxVocab bounds driver state, not correctness") {
    val spark = SparkFixture.spark
    val docs = spark.read.parquet(s"${SparkFixture.sf0001}/documents.parquet")
    // tiny cap still trains a valid, deterministic, confluent table
    val capped = Bpe.trainMerges(docs, "text", numMerges = 20, maxVocab = 50)
    assert(capped.nonEmpty && capped.forall { case (a, b) => a != b })
    assert(Bpe.trainMerges(docs, "text", 20, maxVocab = 50) == capped)
  }
}
