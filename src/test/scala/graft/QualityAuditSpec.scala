package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityAudit

class QualityAuditSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("ok"), Some(2L)),
    (2L, None, Some(0L)),          // null text
    (3L, Some(""), Some(0L)),      // empty text
    (2L, Some("dup"), None),       // duplicate id + null len
    (-1L, Some("neg"), Some(3L))
  ).toDF("id", "text", "len")

  test("null predicate counts as violation; counts exact per rule") {
    val r = QualityAudit.audit(fixture, Seq(
        "id_nonneg" -> (col("id") >= 0),
        "text_not_null" -> col("text").isNotNull,
        "len_consistent" -> (col("len") === length(col("text")))))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r("id_nonneg") == (5L, 1L, false))
    assert(r("text_not_null") == (5L, 1L, false))
    // len_consistent violations: null text (null pred), "" vs 0 passes,
    // null len (null pred), "neg" len 3 passes, "ok" len 2 passes -> 2
    assert(r("len_consistent") == (5L, 2L, false))
  }

  test("all-pass rule reports pass=true") {
    val r = QualityAudit.audit(fixture, Seq(
        "id_small" -> (abs(col("id")) < 100))).head()
    assert(r.getLong(2) == 0 && r.getBoolean(3))
  }

  test("uniqueness: both copies count; NULL keys exempt") {
    val df = Seq(Some(1L), Some(2L), Some(2L), Some(2L), None, None)
      .toDF("k")
    val r = QualityAudit.uniqueness(df, Seq("k"), "k_unique").head()
    assert(r.getString(0) == "k_unique")
    assert(r.getLong(1) == 6L, "n_rows is the full table")
    assert(r.getLong(2) == 3L, "all three copies of k=2 are violations")
    assert(!r.getBoolean(3))
    val ok = QualityAudit.uniqueness(df.where(col("k") =!= 2 ||
      col("k").isNull), Seq("k"), "k_unique").head()
    assert(ok.getLong(2) == 0L && ok.getBoolean(3),
      "NULL keys never collide (SQL UNIQUE semantics)")
  }

  test("N rules compile into ONE scan of the table") {
    val docs = spark.read.parquet(
      s"${SparkFixture.sf0001}/documents.parquet")
    val plan = QualityAudit.audit(docs, Seq(
        "a" -> col("doc_id").isNotNull,
        "b" -> (length(col("text")) > 0),
        "c" -> (col("n_chars") >= 0)))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"audit must read the table once, not per rule:\n$plan")
  }

  test("duplicate rule names rejected") {
    intercept[IllegalArgumentException](
      QualityAudit.audit(fixture, Seq("x" -> lit(true), "x" -> lit(false))))
  }
}
