package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Sweep-line peak-concurrency entry (ev_concurrency) on synthetic
  * fixtures with hand-computed answers — midnight carry-in, multi-day
  * spans, and tie instants are the cases the per-day decomposition
  * must get right. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write synthetic events to a temp sf-dir and run the entry. */
  private def run(rows: Seq[(Long, Timestamp, Long)]): Map[String, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_conc_")
    dir.toFile.deleteOnExit()
    rows.toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.queries.Events.evConcurrency(spark, dir.toString)
      .as[(String, Long)].collect().toMap
  }

  test("cross-midnight session carries into the next day") {
    // u1: one session 23:50 → 00:10 (+1 day); u2: point session 23:55.
    // Day 1 peak = 2 (both active at 23:55); day 2 peak = 1 (carry-in
    // only — the only delta in day 2 is u1's departure).
    val out = run(Seq(
      (1L, ts("2024-03-01 23:50:00"), 1L),
      (2L, ts("2024-03-02 00:10:00"), 1L),
      (3L, ts("2024-03-01 23:55:00"), 2L)))
    assert(out == Map("2024-03-01" -> 2L, "2024-03-02" -> 1L))
  }

  test("a session spanning a whole calendar day still counts there") {
    // One user active continuously from day1 23:00 to day3 01:00
    // (events every 20 min — never a 30-min gap): day 2 has NO deltas
    // at all, yet its peak is 1 via the carry-in.
    val start = ts("2024-03-01 23:00:00").getTime
    val end = ts("2024-03-03 01:00:00").getTime
    val rows = (start to end by 20 * 60 * 1000).zipWithIndex.map {
      case (ms, i) => (i.toLong, new Timestamp(ms), 9L) }
    val out = run(rows)
    assert(out == Map("2024-03-01" -> 1L, "2024-03-02" -> 1L,
      "2024-03-03" -> 1L))
  }

  test("simultaneous arrival and departure at one instant net out") {
    // u1 ends at exactly 12:00:00 (inclusive end ⇒ still active AT
    // 12:00), u2 starts at 12:00 ⇒ both active at that instant: peak 2.
    val out = run(Seq(
      (1L, ts("2024-03-01 11:00:00"), 1L),
      (2L, ts("2024-03-01 12:00:00"), 1L),
      (3L, ts("2024-03-01 12:00:00"), 2L),
      (4L, ts("2024-03-01 12:20:00"), 2L)))
    assert(out == Map("2024-03-01" -> 2L))
  }

  test("gap splits sessions: no phantom concurrency from one user") {
    // same user, two sessions 2h apart — never concurrent with itself
    val out = run(Seq(
      (1L, ts("2024-03-01 08:00:00"), 1L),
      (2L, ts("2024-03-01 08:10:00"), 1L),
      (3L, ts("2024-03-01 10:30:00"), 1L)))
    assert(out == Map("2024-03-01" -> 1L))
  }

  test("sf0.001 invariants: peak ≥ 1 every day, ≤ total users") {
    val out = graft.queries.Events.evConcurrency(
      spark, SparkFixture.sf0001).as[(String, Long)].collect()
    assert(out.nonEmpty)
    val users = spark.read
      .parquet(s"${SparkFixture.sf0001}/events.parquet")
      .select("user_id").distinct().count()
    out.foreach { case (day, m) =>
      assert(m >= 1 && m <= users, s"$day peak $m out of range") }
  }

  test("a session ending at a day's last microsecond stays in its day") {
    // u1's point session ends at 23:59:59.999999 — its sweep decrement
    // (emitted at e_us+1, which is numerically the NEXT day's first
    // microsecond) must be CLAMPED into day 1: placed in day 2 it
    // would be a spurious leading −1 there, depressing day 2's prefix
    // sums so u2's solo session would score peak 0 instead of 1.
    val lastUs = Timestamp.valueOf("2024-03-01 23:59:59.999999")
    val out = run(Seq(
      (1L, lastUs, 1L),
      (2L, ts("2024-03-02 08:00:00"), 2L)))
    assert(out == Map("2024-03-01" -> 1L, "2024-03-02" -> 1L))
  }
}
