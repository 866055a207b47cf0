package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.Random
import graft.operators.{AsOfJoin, TopKPerKey, UnionDfs}

/** Differential testing on seeded random data: each distributed operator
  * vs an independent brute-force reference computed in plain Scala.
  * Seeds are fixed — failures reproduce exactly. */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("AsOfJoin == brute-force most-recent-prior on random data") {
    val rng = new Random(42)
    val lefts = (1 to 300).map(i =>
      (rng.nextInt(10).toLong, new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i.toLong))
    val rights = (1 to 200).map(i =>
      (rng.nextInt(12).toLong, new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i * 1.5))
    val l = lefts.toDF("key", "ts", "lid")
    val r = rights.toDF("key", "ts", "px")
    val got = AsOfJoin(l, r, "key", "ts", Seq("px"))
      .collect()
      .map(row => row.getAs[Long]("lid") ->
        Option(row.getAs[Any]("asof_px")).map(_.asInstanceOf[Double]))
      .toMap
    // brute force: latest right with ts <= left.ts per key; tiebreak on
    // equal right ts = max px position... rights have unique (key, ts)?
    // Possibly not — dedupe rights to the LAST-wins-by-px like the
    // window (last over equal ts is the max in orderBy(ts, side) with
    // stable input order not guaranteed) — so keep only rights with
    // unique (key, ts) to make the reference well-defined.
    val uniqueRights = rights.groupBy(x => (x._1, x._2))
      .filter(_._2.size == 1).values.flatten.toSeq
    val rightsByKey = uniqueRights.groupBy(_._1)
    lefts.foreach { case (k, ts, lid) =>
      val expected = rightsByKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(ts))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
      val dupTs = rights.groupBy(x => (x._1, x._2)).exists { case ((rk, rts), vs) =>
        rk == k && !rts.after(ts) && vs.size > 1 }
      if (!dupTs) // skip lefts whose answer depends on ambiguous dup-ts rights
        assert(got(lid) == expected, s"left $lid key=$k ts=$ts")
    }
  }

  test("AsOfJoin forward == brute-force earliest-at-or-after on random data") {
    val rng = new Random(77)
    val lefts = (1 to 300).map(i =>
      (rng.nextInt(10).toLong, new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i.toLong))
    val rights = (1 to 200).map(i =>
      (rng.nextInt(12).toLong, new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i * 1.5))
    val l = lefts.toDF("key", "ts", "lid")
    val r = rights.toDF("key", "ts", "px")
    val got = AsOfJoin(l, r, "key", "ts", Seq("px"), direction = "forward")
      .collect()
      .map(row => row.getAs[Long]("lid") ->
        Option(row.getAs[Any]("asof_px")).map(_.asInstanceOf[Double]))
      .toMap
    val uniqueRights = rights.groupBy(x => (x._1, x._2))
      .filter(_._2.size == 1).values.flatten.toSeq
    val rightsByKey = uniqueRights.groupBy(_._1)
    lefts.foreach { case (k, ts, lid) =>
      val expected = rightsByKey.getOrElse(k, Seq.empty)
        .filter(!_._2.before(ts)) // at-or-after: inclusive tie
        .sortBy(_._2.getTime)
        .headOption.map(_._3)
      val dupTs = rights.groupBy(x => (x._1, x._2)).exists { case ((rk, rts), vs) =>
        rk == k && !rts.before(ts) && vs.size > 1 }
      if (!dupTs)
        assert(got(lid) == expected, s"left $lid key=$k ts=$ts")
    }
  }

  test("AsOfJoin nearest == brute-force closest-in-time (backward ties)") {
    val rng = new Random(91)
    val lefts = (1 to 300).map(i =>
      (rng.nextInt(10).toLong, new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i.toLong))
    val rights = (1 to 200).map(i =>
      (rng.nextInt(12).toLong, new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i * 1.5))
    val l = lefts.toDF("key", "ts", "lid")
    val r = rights.toDF("key", "ts", "px")
    val got = AsOfJoin(l, r, "key", "ts", Seq("px"), direction = "nearest")
      .collect()
      .map(row => row.getAs[Long]("lid") ->
        Option(row.getAs[Any]("asof_px")).map(_.asInstanceOf[Double]))
      .toMap
    val uniqueRights = rights.groupBy(x => (x._1, x._2))
      .filter(_._2.size == 1).values.flatten.toSeq
    val rightsByKey = uniqueRights.groupBy(_._1)
    lefts.foreach { case (k, ts, lid) =>
      val rs = rightsByKey.getOrElse(k, Seq.empty)
      val back = rs.filter(!_._2.after(ts)).sortBy(_._2.getTime).lastOption
      val fwd = rs.filter(!_._2.before(ts)).sortBy(_._2.getTime).headOption
      val expected = (back, fwd) match {
        case (None, f) => f.map(_._3)
        case (b, None) => b.map(_._3)
        case (Some(b), Some(f)) =>
          val db = ts.getTime - b._2.getTime
          val df = f._2.getTime - ts.getTime
          Some(if (db <= df) b._3 else f._3) // ties prefer backward
      }
      val dupTs = rights.groupBy(x => (x._1, x._2))
        .exists { case ((rk, _), vs) => rk == k && vs.size > 1 }
      if (!dupTs)
        assert(got(lid) == expected, s"left $lid key=$k ts=$ts")
    }
  }

  test("TopKPerKey == window on random skewed data") {
    val rng = new Random(7)
    val rows = (1 to 5000).map { i =>
      val key = if (rng.nextInt(4) == 0) 1L else rng.nextInt(50).toLong
      (key, rng.nextDouble() * 1000, i.toLong)
    }
    val df = rows.toDF("k", "score", "id").repartition(8)
    val viaAgg = TopKPerKey(df, Seq("k"), "score", "id", k = 5)
      .select("k", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5).select("k", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("UnionDfs n-ary: three frames, full column union") {
    val a = Seq((1L, "a")).toDF("id", "x")
    val b = Seq((2L, 2.5)).toDF("id", "y")
    val c = Seq((3L, true)).toDF("id", "z")
    val u = UnionDfs(a, b, c).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "x", "y", "z"))
    val rows = u.collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "a" && rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(rows(2).getBoolean(3) && rows(2).isNullAt(1))
  }

  test("contaminationPairs == brute-force shingle intersection") {
    val rnd = new Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
    val rows = (0L until 40L).map(i => (i, doc(8 + rnd.nextInt(12)),
      i % 4 == 0))
    val df = rows.toDF("doc_id", "text", "bench")
    val got = graft.ext.Retrieval.contaminationPairs(
      df, "doc_id", "text", col("bench"), n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    def shingles(t: String): Set[String] =
      graft.ext.TextFunctions.tokenizeFn(t)
        .sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
    val want = (for {
      (bid, bt, bf) <- rows if bf
      (cid, ct, cf) <- rows if !cf
      shared = (shingles(bt) & shingles(ct)).size if shared >= 1
    } yield (bid, cid) -> shared).toMap
    assert(got == want)
  }

  test("surprisal == brute-force unigram scoring on random corpus") {
    val rnd = new Random(31)
    val vocab = Vector("x", "y", "z", "w", "v", "u")
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val got = graft.ext.Retrieval.surprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val allToks = rows.flatMap(r => graft.ext.TextFunctions.tokenizeFn(r._2))
    val freq = allToks.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    val total = allToks.size.toDouble
    rows.foreach { case (id, t) =>
      val toks = graft.ext.TextFunctions.tokenizeFn(t)
      val naive = -toks.map(tok =>
        math.log(freq(tok) / total)).sum / toks.length
      assert(math.abs(got(id) - naive) < 1.5e-6,
        s"doc $id: got ${got(id)} want ~$naive")
    }
  }

  test("bigramSurprisal == brute-force bigram scoring on random corpus") {
    val rnd = new Random(47)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (0L until 50L).map(i =>
      (i, Seq.fill(2 + rnd.nextInt(15))(
        vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val got = graft.ext.Retrieval.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent reference: plain Scala count maps, vocab << caps
    def bigrams(ts: Seq[String]) = ts.zip(ts.tail).map(p => p._1 + " " + p._2)
    val toksBy = rows.map { case (id, t) =>
      id -> graft.ext.TextFunctions.tokenizeFn(t).toSeq }.toMap
    val uni = toksBy.values.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toDouble }
    val bi = toksBy.values.flatMap(bigrams).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toDouble }
    rows.foreach { case (id, _) =>
      val ts = toksBy(id)
      val naive = -bigrams(ts).map { b =>
        math.log(bi(b) / uni(b.substring(0, b.indexOf(' '))))
      }.sum / (ts.length - 1)
      assert(math.abs(got(id) - naive) < 1.5e-6,
        s"doc $id: got ${got(id)} want ~$naive")
    }
  }

  test("chunkFn: lossless coverage, exact windows, total on any input") {
    val rnd = new Random(53)
    val fn = graft.ext.TextFunctions.chunkFn(size = 50, overlap = 10)
    (0 until 200).foreach { _ =>
      val len = rnd.nextInt(300)
      val text = Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      val cs = fn(text)
      assert(cs.nonEmpty) // total: >= 1 chunk always
      // starts advance by step; every chunk is the exact substring
      cs.foreach { case (i, start, t) =>
        assert(start == i * 40)
        assert(t == text.substring(start, math.min(start + 50, text.length)))
      }
      // coverage is lossless: stitching chunks (dropping each overlap)
      // reconstructs the text exactly
      val stitched = cs.map(_._3).zipWithIndex.map {
        case (t, 0) => t
        case (t, _) => t.drop(10)
      }.mkString
      assert(stitched == text)
      // every chunk but the last is full-size
      cs.dropRight(1).foreach { case (_, _, t) => assert(t.length == 50) }
    }
    assert(fn(null).map(_._3) == Seq("")) // null text -> one empty chunk
  }

  test("winnowFn == brute-force window minima on random text") {
    val rng = new Random(1337)
    val alphabet = "ab cd"
    def hash60(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      var v = 0L
      (0 until 7).foreach(j => v = (v << 8) | (d(j) & 0xffL))
      (v << 4) | ((d(7) >> 4) & 0xfL)
    }
    val (k, w) = (4, 3)
    val fn = graft.ext.TextFunctions.winnowFn(k, w)
    (1 to 200).foreach { _ =>
      val len = rng.nextInt(30)
      val text = (1 to len).map(_ => alphabet(rng.nextInt(5))).mkString
      // brute force straight from the definition
      val t = text.toLowerCase.replaceAll("[ \\t\\n\\u000B\\f\\r]+", " ")
      val grams = (0 to t.length - k).map(i => hash60(t.substring(i, i + k)))
      val expect =
        if (grams.isEmpty) Seq.empty[Long]
        else if (grams.length <= w) Seq(grams.min)
        else grams.sliding(w).map(_.min).toSeq
      assert(fn(text).toSeq == expect.distinct.sorted,
        s"text=${text.replace(' ', '_')}")
    }
  }

  /** Independent oracle: plain Scala union-find with path compression. */
  private def unionFindLabels(
      nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root by min-id: union always hangs the larger root under the
    // smaller, so find() already yields the component minimum
    nodes.map(n => n -> find(n)).toMap
  }

  test("connectedComponents: diameter-40 path graph == union-find oracle") {
    // The shape that broke O(diameter) min-label propagation at the old
    // maxIters=20 cap: a transitive near-dup CHAIN 0-1-2-...-40 (each
    // doc similar only to its neighbor). Large-star/small-star must
    // collapse it to one cluster labeled 0 in O(log n) rounds.
    val chain = (0L until 40L).map(i => (i, i + 1))
    val pairs = chain.toDF("id_a", "id_b")
    val got = graft.ext.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFindLabels((0L to 40L).toSeq, chain)
    assert(got == want)
    assert(got.values.toSet == Set(0L)) // one component, min label
  }

  test("connectedComponents == union-find on random graphs (chains, cliques, isolates)") {
    val rng = new Random(4242)
    (1 to 5).foreach { trial =>
      val n = 60 + rng.nextInt(40)
      val nodes = (0L until n.toLong).toSeq
      // mixed shapes: sparse random edges + one long chain segment
      val randomEdges = (1 to n).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val chainStart = rng.nextInt(n / 2).toLong
      val chainEdges = (chainStart until math.min(
        chainStart + 25, n.toLong - 1)).map(i => (i, i + 1))
      val edges = (randomEdges ++ chainEdges).filter(e => e._1 != e._2)
      val pairs = edges.toDF("id_a", "id_b")
      val got = graft.ext.Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = unionFindLabels(touched, edges)
      assert(got == want, s"trial $trial n=$n")
    }
  }

  test("AsOfJoin sliced (skew mode) == unsliced, all directions, hot key") {
    val rng = new Random(123)
    // Hot key 0 carries ~60% of both sides (the straggler shape the
    // slice exists for); ts over ~100 slices of 1000 s, rights sparse
    // enough that many slices are left-only — the cross-slice boundary
    // repair is genuinely exercised, not just the local carry.
    def key(): Long = if (rng.nextInt(10) < 6) 0L else 1L + rng.nextInt(8)
    val lefts = (1 to 600).map { i =>
      (key(), new java.sql.Timestamp(1700000000000L +
        rng.nextInt(100000) * 1000L), i.toLong)
    }
    // unique right (key, ts) — the determinism precondition both paths
    // share (and DuckDB ASOF documents)
    val usedR = scala.collection.mutable.Set.empty[(Long, Long)]
    val rights = (1 to 150).flatMap { i =>
      val k = key()
      val t = 1700000000000L + rng.nextInt(100000) * 1000L
      if (usedR.add((k, t))) Some((k, new java.sql.Timestamp(t), i * 1.5))
      else None
    }
    val l = lefts.toDF("key", "ts", "lid")
    val r = rights.toDF("key", "ts", "px")
    for {
      dir <- Seq("backward", "forward", "nearest")
      // ~100 slices; 1 s = every distinct ts its own slice (carry is
      // almost entirely boundary repair); huge = one slice (degenerates
      // to the classic plan modulo the extra join)
      span <- Seq(1000L * 1000000L, 1000000L, Long.MaxValue / 4)
    } {
      val base = AsOfJoin(l, r, "key", "ts", Seq("px"), dir)
        .collect().map(_.toSeq).toSet
      val sliced = AsOfJoin(l, r, "key", "ts", Seq("px"), dir,
        timeSliceMicros = Some(span)).collect().map(_.toSeq).toSet
      assert(sliced == base, s"direction=$dir span=$span")
      // the NATIVE sliced merge under the same randomized sweep — the
      // composite-key + boundary-repair path must match the reference
      // semantics at every span, including the degenerate ones
      val natSliced = graft.plans.MergeAsOf.join(
        l, r, "key", "ts", Seq("px"), dir,
        timeSliceMicros = Some(span)).collect().map(_.toSeq).toSet
      assert(natSliced == base, s"NATIVE direction=$dir span=$span")
    }
  }
}
