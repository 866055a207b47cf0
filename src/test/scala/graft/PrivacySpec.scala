package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The DP release entry (t_dp_counts): keyed-PRF Laplace noise must be
  * replayable, correctly calibrated, and leave group structure alone. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def run() =
    graft.queries.Ext.tDpCounts(spark, SparkFixture.sf0001)
      .as[(String, String, Double)].collect()

  test("deterministic replay: two runs release identical values") {
    assert(run().toSet == run().toSet)
  }

  test("group structure preserved; noise centred and Laplace-scaled") {
    val docs = spark.read
      .parquet(s"${SparkFixture.sf0001}/documents.parquet")
    val truth = docs.groupBy("source", "lang").count()
      .as[(String, String, Long)].collect()
      .map { case (s, l, n) => (s, l) -> n }.toMap
    val released = run()
    assert(released.map(r => (r._1, r._2)).toSet == truth.keySet)
    val noises = released.map { case (s, l, v) => v - truth((s, l)) }
    // Laplace(b=2): mean |noise| = b = 2; sd of the mean over n draws
    // ~ 2.8/sqrt(n). Generous 5-sigma band — deterministic draws, so
    // this can never flake: it either always passes or is a real bug.
    val meanAbs = noises.map(math.abs).sum / noises.length
    val bound = 5 * 2.83 / math.sqrt(noises.length.toDouble)
    assert(math.abs(meanAbs - 2.0) < bound + 0.5,
      s"mean |noise| $meanAbs far from Laplace b=2")
    // signs must not be one-sided (sign bit comes from the PRF's
    // high-order behavior): both directions present
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
  }

  test("noise replays the documented inverse-CDF formula exactly") {
    val released = run()
    val truth = spark.read
      .parquet(s"${SparkFixture.sf0001}/documents.parquet")
      .groupBy("source", "lang").count()
      .as[(String, String, Long)].collect()
    truth.foreach { case (src, lang, n) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$src:$lang:41".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md.take(15), 16).toDouble /
        1.152921504606846976e18
      val su = u - 0.5
      val noise = -2.0 * math.signum(su) *
        math.log(math.max(1e-12, 1.0 - 2.0 * math.abs(su)))
      val want = math.floor((n + noise) * 1e6 + 0.5) / 1e6
      val got = released.find(r => r._1 == src && r._2 == lang).get._3
      assert(got == want, s"($src,$lang): got $got want $want")
    }
  }
}
