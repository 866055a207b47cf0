package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, PageRank}

import scala.util.Random

/** Specs for the round-9 graph + sketch operators: fixed-point PageRank
  * and two-pass Misra-Gries heavy hitters. */
class GraphSketchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ---- PageRank ----------------------------------------------------

  /** Sequential reference: the identical integer recurrence, computed
    * single-threaded on the driver. */
  private def pagerankRef(edges: Seq[(Long, Long)], iters: Int,
                          scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = outdeg.size.toLong
    val base = (15L * scale / 100L) / n
    var r: Map[Long, Long] = outdeg.map { case (k, _) => k -> scale / n }
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = in.map { case (node, s) => node -> (base + 85L * s / 100L) }
    }
    r
  }

  test("PageRank matches the sequential integer recurrence exactly") {
    val rnd = new Random(7)
    // random symmetric graph on 40 nodes
    val undirected = (1 to 120).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = (undirected ++ undirected.map(_.swap)).distinct
    val df = edges.toDF("src", "dst")
    val got = PageRank.run(df, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = pagerankRef(edges, 10)
    assert(got == want)
  }

  test("PageRank on a symmetric ring is uniform; hubs outrank leaves") {
    // ring: every node identical by symmetry → identical fixed-point rank
    val n = 12L
    val ring = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), ((i + 1) % n, i)))
    val r = PageRank.run(ring.toDF("src", "dst"), 5).collect()
    assert(r.map(_.getLong(1)).distinct.length == 1)
    // star: hub (0) linked to 6 leaves, symmetric; hub must outrank
    val star = (1L to 6L).flatMap(i => Seq((0L, i), (i, 0L)))
    val s = PageRank.run(star.toDF("src", "dst"), 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 6L).forall(i => s(0L) > s(i)))
  }

  // ---- HeavyHitters ------------------------------------------------

  /** Zipf-ish corpus: item i drawn with weight 1/(i+1); ~600 distinct
    * items so an m=40 sketch genuinely prunes. */
  private def zipfCorpus(n: Int, items: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (0 until items).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (1 to n).map { _ =>
      val u = rnd.nextDouble()
      s"item_${cum.indexWhere(u <= _)}"
    }
  }

  test("Misra-Gries sketch keeps every item above N/m under real pruning") {
    val corpus = zipfCorpus(20000, 600, seed = 11)
    val df = corpus.toDF("token").repartition(7) // force multi-sketch merge
    val m = 40
    val cand = HeavyHitters.candidates(df, "token", m)
      .as[String].collect().toSet
    assert(cand.size <= m, "sketch must stay within capacity")
    val exact = corpus.groupBy(identity).map { case (k, v) => k -> v.size }
    val mustSurvive = exact.collect {
      case (k, c) if c.toLong * m > corpus.size => k
    }.toSet
    assert(mustSurvive.nonEmpty, "fixture must exercise the guarantee")
    assert(mustSurvive.subsetOf(cand),
      s"lost heavy items: ${mustSurvive -- cand}")
  }

  test("two-pass HeavyHitters equals the naive exact query") {
    val corpus = zipfCorpus(20000, 600, seed = 23)
    val df = corpus.toDF("token").repartition(5)
    val t = 100
    val got = HeavyHitters(df, "token", t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = corpus.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
      .filter { case (_, c) => c * t > corpus.size }
    assert(got == exact)
    assert(got.nonEmpty)
  }
}
