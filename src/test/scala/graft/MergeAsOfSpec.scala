package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.MergeAsOf

/** The native sort-merge as-of operator must be row-identical to the
  * declarative union+window twin — on the real events fixture for all
  * three directions, and on planted null-key/null-ts/empty edges. */
class MergeAsOfSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)

  private def events = graft.queries.Tables.events(spark, SparkFixture.sf0001)

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("differential vs declarative AsOfJoin on the events fixture, 3 directions") {
    // left = odd events, right = even events (same shape as the oracle
    // entries); payload = value
    val l = events.where(col("event_id") % 2 === 1)
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = events.where(col("event_id") % 2 === 0)
      .select(col("user_id"), col("ts"), col("value"))
    Seq("backward", "forward", "nearest").foreach { dir =>
      val declarative = AsOfJoin(l, r, "user_id", "ts", Seq("value"), dir)
      val native = MergeAsOf.join(l, r, "user_id", "ts", Seq("value"), dir)
      assert(declarative.columns.toSeq == native.columns.toSeq)
      assert(canon(declarative) == canon(native), s"direction $dir")
    }
  }

  test("plan: native operator with co-partitioning exchanges + sorts") {
    val l = events.select(col("user_id"), col("ts"), col("event_id"))
    val r = events.select(col("user_id"), col("ts"), col("value"))
    val df = MergeAsOf.join(l, r, "user_id", "ts", Seq("value"))
    df.count() // force execution through AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("MergeAsOf"), p.take(2000))
    assert("Sort ".r.findAllIn(p).size >= 2, "both sides sorted:\n" + p.take(2000))
    assert(!p.contains("Window"), "no window state in the native path")
  }

  test("null keys and null timestamps never match; parity with declarative") {
    val l = Seq(
      (java.lang.Long.valueOf(1L), ts(10), "a"),
      (null.asInstanceOf[java.lang.Long], ts(10), "nullkey"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], "nullts"))
      .toDF("key", "ts", "tag")
    val r = Seq(
      (java.lang.Long.valueOf(1L), ts(8), 100.0),
      (null.asInstanceOf[java.lang.Long], ts(5), 666.0),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], 777.0))
      .toDF("key", "ts", "px")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val nat = MergeAsOf.join(l, r, "key", "ts", Seq("px"), dir)
        .collect().map(row => row.getString(2) -> Option(row.get(3))).toMap
      assert(nat("nullkey").isEmpty, dir)
      assert(nat("nullts").isEmpty, dir)
      assert(!nat.values.flatten.exists(v => v == 666.0 || v == 777.0), dir)
      val dec = AsOfJoin(l, r, "key", "ts", Seq("px"), dir)
        .collect().map(row => row.getString(2) -> Option(row.get(3))).toMap
      assert(nat == dec, s"parity $dir")
    }
  }

  test("nearest breaks exact two-sided microsecond ties backward") {
    val l = Seq((1L, ts(10), "mid")).toDF("key", "ts", "tag")
    val r = Seq((1L, ts(5), 1.0), (1L, ts(15), 2.0)).toDF("key", "ts", "px")
    val got = MergeAsOf.join(l, r, "key", "ts", Seq("px"), "nearest").collect()
    assert(got.head.getDouble(3) == 1.0, "equidistant -> backward")
  }

  test("empty sides: right-empty carries nulls; left-empty yields nothing") {
    val l = Seq((1L, ts(10), "a")).toDF("key", "ts", "tag")
    val r = Seq((1L, ts(8), 1.0)).toDF("key", "ts", "px")
    val emptyR = r.where(lit(false))
    val g1 = MergeAsOf.join(l, emptyR, "key", "ts", Seq("px")).collect()
    assert(g1.length == 1 && g1.head.isNullAt(3))
    val emptyL = l.where(lit(false))
    assert(MergeAsOf.join(emptyL, r, "key", "ts", Seq("px")).count() == 0)
  }

  test("string keys merge correctly (non-primitive interpreted ordering)") {
    val l = Seq(("aa", ts(10), 1), ("bb", ts(10), 2), ("cc", ts(10), 3))
      .toDF("key", "ts", "n")
    val r = Seq(("aa", ts(5), 10.0), ("bb", ts(6), 20.0), ("zz", ts(1), 99.0))
      .toDF("key", "ts", "px")
    val got = MergeAsOf.join(l, r, "key", "ts", Seq("px"))
      .collect().map(row => row.getInt(2) -> Option(row.get(3))).toMap
    assert(got(1).contains(10.0) && got(2).contains(20.0) && got(3).isEmpty)
  }

  test("SLICED native == declarative sliced == unsliced, 3 directions") {
    // events fixture + planted slice-BOUNDARY timestamps: right rows
    // exactly on multiples of the span, left probes on/either side
    val span = 6L * 3600 * 1000000 // 6h slices
    val l0 = events.where(col("event_id") % 2 === 1)
      .select(col("user_id"), col("ts"), col("event_id"))
    val r0 = events.where(col("event_id") % 2 === 0)
      .select(col("user_id"), col("ts"), col("value"))
    val edge = (1 to 8).map { i =>
      val us = (1700000000000000L / span + i) * span // exact boundary
      (999L, new Timestamp(us / 1000), Some(i * 1.0))
    }
    val lEdge = edge.map { case (u, t0, _) => (u, t0, 1L) }
      .toDF("user_id", "ts", "event_id")
    val rEdge = edge.toDF("user_id", "ts", "value")
    val l = l0.unionByName(lEdge)
    val r = r0.unionByName(rEdge)
    Seq("backward", "forward", "nearest").foreach { dir =>
      val unsliced = MergeAsOf.join(l, r, "user_id", "ts", Seq("value"), dir)
      val declSliced = AsOfJoin(l, r, "user_id", "ts", Seq("value"), dir,
        timeSliceMicros = Some(span))
      val natSliced = MergeAsOf.join(l, r, "user_id", "ts", Seq("value"),
        dir, timeSliceMicros = Some(span))
      assert(natSliced.columns.toSeq == unsliced.columns.toSeq)
      assert(canon(natSliced) == canon(unsliced), s"native sliced vs unsliced, $dir")
      assert(canon(natSliced) == canon(declSliced), s"native vs declarative sliced, $dir")
    }
  }

  test("sliced native: null keys/timestamps never match (guard, not join luck)") {
    val span = 60L * 1000000
    val l = Seq(
      (Some(1L), Some(ts(10)), 100L),
      (None, Some(ts(10)), 101L),
      (Some(1L), None, 102L)
    ).toDF("k", "ts", "id")
    val r = Seq(
      (Some(1L), Some(ts(5)), Some(5.0)),
      (None, Some(ts(5)), Some(6.0)),
      (Some(1L), None, Some(7.0))
    ).toDF("k", "ts", "v")
    Seq("backward", "forward", "nearest").foreach { dir =>
      val natRows = MergeAsOf.join(l, r, "k", "ts", Seq("v"), dir,
          timeSliceMicros = Some(span))
        .collect().map(x => (x.getLong(2), Option(x.get(3)))).toMap
      val expected = dir match {
        case "forward" => Map(100L -> None, 101L -> None, 102L -> None)
        case _ => Map(100L -> Some(5.0), 101L -> None, 102L -> None)
      }
      assert(natRows == expected, s"dir $dir: $natRows")
    }
  }

  test("sliced native plan: merge keyed on the composite, no key-only exchange") {
    val span = 6L * 3600 * 1000000
    val l = events.select(col("user_id"), col("ts"), col("event_id"))
    val r = events.select(col("user_id"), col("ts"), col("value"))
    val df = MergeAsOf.join(l, r, "user_id", "ts", Seq("value"),
      "backward", timeSliceMicros = Some(span))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("MergeAsOf"), "native operator must still run:\n" + p.take(1500))
    assert(p.contains("__mk"), "merge must key on the composite (key, slice):\n" + p.take(1500))
  }
}
