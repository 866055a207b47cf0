package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.codec.Tensor
import graft.ext.Dedup
import graft.functions.StableHash

/** Property-based tests (raw ScalaCheck — the scalatest bridge isn't on
  * the classpath) — closes the reference's own test gap (SURVEY §5:
  * "ScalaCheck ... for property tests of codec round-trips"). */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  test("Tensor.fromDoubles/toDoubles is the identity for any payload") {
    check("tensor-double", Prop.forAll(Gen.listOf(Gen.chooseNum(-1e12, 1e12))) {
      xs: List[Double] =>
        val t = Tensor.fromDoubles(xs.toArray)
        t.toDoubles.toSeq == xs &&
          (if (xs.length * 8 >= Tensor.AutoPackMinBytes) t.values.isEmpty
           else t.values_packed.isEmpty)
    })
  }

  test("Tensor.fromFloats/toFloats is the identity") {
    check("tensor-float", Prop.forAll(Gen.listOf(Gen.chooseNum(-1e6f, 1e6f))) {
      xs: List[Float] =>
        Tensor.toFloats(Tensor.fromFloats(xs.toArray)).toSeq == xs
    })
  }

  test("minhash signature: deterministic, length-stable, order-invariant") {
    val sig = Dedup.minhashSignature(64)
    check("minhash", Prop.forAll(Gen.listOf(Gen.alphaNumStr)) {
      shingles: List[String] =>
        val a = sig(shingles)
        a == sig(shingles) && a.size == 64 && sig(shingles.reverse) == a
    })
  }

  test("minhash similarity estimates jaccard within tolerance") {
    val sig = Dedup.minhashSignature(256)
    val base = (1 to 100).map(i => s"sh$i")
    val a = sig(base)
    check("minhash-jaccard", Prop.forAll(Gen.chooseNum(0, 100)) { overlap: Int =>
      val other = (1 to overlap).map(i => s"sh$i") ++
        (1 to (100 - overlap)).map(i => s"other$i")
      val trueJ = overlap.toDouble / (200 - overlap)
      val est = a.zip(sig(other)).count { case (x, y) => x == y }.toDouble / 256
      math.abs(est - trueJ) < 0.15
    })
  }

  test("simhash: deterministic; hamming symmetric") {
    check("simhash", Prop.forAll(
      Gen.listOf(Gen.alphaNumStr), Gen.listOf(Gen.alphaNumStr)) {
      (a: List[String], b: List[String]) =>
        val ha = Dedup.simhash64Fn(a)
        val hb = Dedup.simhash64Fn(b)
        Dedup.simhash64Fn(a) == ha &&
          java.lang.Long.bitCount(ha ^ hb) == java.lang.Long.bitCount(hb ^ ha)
    })
  }

  test("stableHash: deterministic; distinct on distinct strings") {
    check("stablehash", Prop.forAll { (s1: String, s2: String) =>
      StableHash.stableHash(s1) == StableHash.stableHash(s1) &&
        (s1 == s2 || StableHash.stableHash(s1) != StableHash.stableHash(s2))
    })
  }

  test("TokenPacker: gapless stream, monotone packs, boundary math (any sizes)") {
    lazy val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 900L))
    check("token-packer", Prop.forAll(gen, Gen.chooseNum(1L, 600L)) {
      (sizes: List[Long], chunk: Long) =>
        val df = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n) }
          .toDF("doc_id", "n_tokens").repartition(3)
        val rows = graft.operators.TokenPacker(
            df, "n_tokens", chunk, Seq(col("doc_id")))
          .orderBy("doc_id")
          .select("doc_id", "n_tokens", "start_token", "pack_first", "pack_last")
          .collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        // gapless: start = running sum of previous sizes
        val starts = sizes.scanLeft(0L)(_ + _).init
        rows.map(_._2).toSeq == starts &&
          rows.forall { case (n, st, pf, pl) =>
            pf == st / chunk &&
              (if (n > 0) pl == (st + n - 1) / chunk else pl == pf) &&
              pl >= pf
          }
    })
  }

  test("RangeJoin: equals naive join for any interval, incl. degenerate") {
    lazy val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 5000000L)))
    check("range-join", Prop.forAll(evGen,
      Gen.chooseNum(-2000000L, 2000000L), Gen.chooseNum(0L, 3000000L)) {
      (evs: List[(Long, Long)], lower: Long, span: Long) =>
        val upper = lower + span
        val df = evs.zipWithIndex
          .map { case ((k, us), i) => (i.toLong, k, new java.sql.Timestamp(us / 1000)) }
        val l = df.toDF("lid", "k", "l_ts")
        val r = df.map { case (i, k, ts) => (i, k, ts) }.toDF("rid", "k", "r_ts")
        val got = graft.operators.RangeJoin(l, r, Seq("k"), ("l_ts", "r_ts"), lower, upper)
          .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val want = l.join(r, l("k") === r("k") &&
            unix_micros(col("r_ts")).between(
              unix_micros(col("l_ts")) + lower, unix_micros(col("l_ts")) + upper))
          .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        got == want
    })
  }

  test("repetition signals live in [0,1]; all-same text maxes both") {
    val textGen = Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" "))
    val dup3 = graft.ext.TextFunctions.dupTrigramFracFn
    val top2 = graft.ext.TextFunctions.topBigramFracFn
    check("repetition-bounds", Prop.forAll(textGen) { t: String =>
      val d: Double = dup3(t); val b: Double = top2(t)
      d >= 0.0 && d <= 1.0 && b >= 0.0 && b <= 1.0
    })
    assert(dup3("x x x x x x") == 1.0 && top2("x x x x x x") == 1.0)
  }

  test("BM25 per-term contribution: monotone in tf, saturating") {
    // the scoring arithmetic the Column expression implements
    def contrib(tf: Double, dl: Double, idf: Double,
        avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
      idf * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
    check("bm25-monotone", Prop.forAll(
      Gen.chooseNum(0, 50), Gen.chooseNum(1, 500), Gen.chooseNum(1, 200)) {
      (tf: Int, dl: Int, davg: Int) =>
        val idf = 1.5
        val c0 = contrib(tf, dl, idf, davg)
        val c1 = contrib(tf + 1, dl, idf, davg)
        // monotone nondecreasing in tf, bounded by the (k1+1)*idf asymptote
        c1 >= c0 && c1 <= idf * 2.2 + 1e-9
    })
  }
}
