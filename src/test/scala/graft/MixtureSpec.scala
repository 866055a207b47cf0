package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Mixture

class MixtureSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def docs = spark.read.parquet(s"${SparkFixture.sf0001}/documents.parquet")

  /** Independent sequential replay of the mixture contract (JVM md5,
    * no Spark): the strong differential check. */
  private def replay(
      rows: Seq[(Long, String, Long)], // (doc_id, source, tokens)
      budgets: Map[String, Long], seed: Long): Set[(Long, String, Long)] = {
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.flatMap { case (id, src, _) =>
      val rate = budgets.get(src) match {
        case Some(b) if totals(src) > 0 => b.toDouble / totals(src).toDouble
        case _ => 0.0
      }
      val hex = md.digest(s"$id:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble
      val base = math.floor(rate).toLong
      val frac = rate - math.floor(rate)
      val copies = base +
        (if (u < frac * 1152921504606846976.0) 1L else 0L)
      (1L to copies).map(e => (id, src, e))
    }.toSet
  }

  test("exact multiset equals an independent sequential replay") {
    val rows = docs.select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val budgets = totals.map { case (s, t) =>
      val f = s.stripPrefix("src").toInt % 4 match {
        case 0 => 0.0; case 1 => 0.5; case 2 => 1.0; case _ => 2.3
      }
      s -> math.floor(t * f).toLong
    }
    val got = Mixture(docs, "source", "n_chars", Seq("doc_id"), budgets,
      seed = 1337L)
      .select("doc_id", "source", "mix_epoch")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == replay(rows, budgets, 1337L))
  }

  test("passthrough keeps every row once; exclusion keeps none") {
    val totals = docs.groupBy("source").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map(
      "src2" -> totals("src2"), // rate exactly 1.0
      "src3" -> 0L)             // rate 0 -> excluded
    val out = Mixture(docs, "source", "n_chars", Seq("doc_id"), budgets)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src2Rows = docs.where(col("source") === "src2").count()
    assert(bySrc.get("src2").contains(src2Rows))
    assert(!bySrc.contains("src3"))
    assert(bySrc.keySet == Set("src2"), "unbudgeted sources must drop")
    // passthrough rows carry exactly epoch 1
    assert(out.where(col("source") === "src2" && col("mix_epoch") =!= 1)
      .isEmpty)
  }

  test("upsample epochs are contiguous 1..copies per row") {
    val totals = docs.groupBy("source").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map("src5" -> totals("src5") * 3) // rate exactly 3.0
    val out = Mixture(docs, "source", "n_chars", Seq("doc_id"), budgets)
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("mix_epoch").as("lo"),
        max("mix_epoch").as("hi"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getLong(1) == 3 && r.getLong(2) == 1 && r.getLong(3) == 3)
    }
  }

  test("partitioning-invariant: repartition(7) gives the same multiset") {
    val budgets = Map("src1" -> 4000L, "src7" -> 17000L)
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixture(df, "source", "n_chars", Seq("doc_id"), budgets)
        .select("doc_id", "mix_epoch")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("temperature mixture: geometric-mean budgets' structural invariants") {
    // budget = floor(sqrt(t * t_min)) ≤ t, so every rate ≤ 1: a doc is
    // emitted at most once (pure downsampling toward balance) — and the
    // SMALLEST source has rate exactly 1.0 (sqrt(t_min²) = t_min): it
    // passes through whole.
    val out = graft.queries.Ext.queries("t_mixture_temp")(
      spark, SparkFixture.sf0001)
    assert(out.where(col("mix_epoch") =!= 1).isEmpty, "rates ≤ 1 ⇒ epoch 1")
    val totals = docs.groupBy("source").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSrc = totals.minBy(t => (t._2, t._1))._1
    val nMinSrcDocs = docs.where(col("source") === minSrc).count()
    assert(out.where(col("source") === minSrc).count() == nMinSrcDocs,
      "smallest source passes through whole (rate exactly 1.0)")
    // down-weighting is monotone-ish in aggregate: the LARGEST source
    // keeps a strictly smaller fraction of docs than the smallest
    val maxSrc = totals.maxBy(t => (t._2, t._1))._1
    val keptMax = out.where(col("source") === maxSrc).count().toDouble /
      docs.where(col("source") === maxSrc).count()
    assert(keptMax < 1.0, "largest source must be downsampled")
  }

  test("A-ES weighted sample: deterministic, weight-biased, k-exact") {
    import spark.implicits._
    val run = () => graft.queries.Ext.tWeightedSample(
      spark, SparkFixture.sf0001).as[(Long, Long)].collect().toSeq
    val a = run()
    assert(a == run(), "PRF draw must make the sample a pure function")
    assert(a.size == 100 && a.map(_._1).distinct.size == 100,
      "exactly k distinct docs (sampling WITHOUT replacement)")
    // char-count weighting must pull the sample's mean size above the
    // corpus mean (deterministic draws — never flakes)
    val corpusMean = spark.read
      .parquet(s"${SparkFixture.sf0001}/documents.parquet")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = a.map(_._2.toDouble).sum / a.size
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean ≤ corpus mean $corpusMean")
  }
}
