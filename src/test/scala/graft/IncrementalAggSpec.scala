package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ord = spark.read.parquet(s"${SparkFixture.sf0001}/orders.parquet")

  private def stateMap(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_orderpriority"), col("n_rows"),
        col("sum_o_totalprice").cast("string"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap

  test("batch boundaries are invisible: 1-shot == 3 folded deltas") {
    val keys = Seq("o_orderpriority")
    val ms = Seq("o_totalprice")
    val oneShot = IncrementalAgg.partial(ord, keys, ms)
    val b1 = ord.where(col("o_orderkey") % 3 === 0)
    val b2 = ord.where(col("o_orderkey") % 3 === 1)
    val b3 = ord.where(col("o_orderkey") % 3 === 2)
    val folded = IncrementalAgg.combine(
      IncrementalAgg.combine(
        IncrementalAgg.partial(b1, keys, ms),
        IncrementalAgg.partial(b2, keys, ms), keys),
      IncrementalAgg.partial(b3, keys, ms), keys)
    assert(stateMap(folded) == stateMap(oneShot))
  }

  test("delta touching NEW groups extends the state (full-outer lanes)") {
    val keys = Seq("k")
    val s0 = IncrementalAgg.partial(
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v"), keys, Seq("v"))
    val d = IncrementalAgg.partial(
      Seq(("b", 10.0)).toDF("k", "v"), keys, Seq("v"))
    val out = IncrementalAgg.combine(s0, d, keys)
      .select(col("k"), col("n_rows"), col("sum_v").cast("double"))
      .as[(String, Long, Double)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(out("a") == ((2L, 3.0)))
    assert(out("b") == ((1L, 10.0)))
  }

  test("null group keys merge as one group (null-safe join keys)") {
    val keys = Seq("k")
    val s0 = IncrementalAgg.partial(
      Seq[(String, Double)]((null, 1.0)).toDF("k", "v"), keys, Seq("v"))
    val d = IncrementalAgg.partial(
      Seq[(String, Double)]((null, 4.0)).toDF("k", "v"), keys, Seq("v"))
    val out = IncrementalAgg.combine(s0, d, keys)
    assert(out.count() == 1)
    assert(out.select(col("sum_v").cast("double")).head.getDouble(0) == 5.0)
  }

  test("at-rest: init + two deltas == one-shot; crash states repaired") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ia_spec_")
    dir.toFile.deleteOnExit()
    val path = s"$dir/state"
    val keys = Seq("o_orderpriority")
    val ms = Seq("o_totalprice")
    val cut = ord.agg(expr("percentile_approx(o_orderkey, 0.5)"))
      .head.getLong(0)
    IncrementalAgg.applyAtRest(spark, path,
      ord.where(col("o_orderkey") <= cut), keys, ms)
    IncrementalAgg.applyAtRest(spark, path,
      ord.where(col("o_orderkey") > cut), keys, ms)
    assert(stateMap(spark.read.parquet(path)) ==
      stateMap(IncrementalAgg.partial(ord, keys, ms)))

    // crash window: src renamed away, bak present → next apply rolls
    // back and folds its delta on the ORIGINAL state
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bak = new org.apache.hadoop.fs.Path(s"$dir/.state__agg_old")
    require(fs.rename(new org.apache.hadoop.fs.Path(path), bak))
    val extra = Seq(("1-URGENT", 100.0)).toDF("o_orderpriority", "o_totalprice")
    IncrementalAgg.applyAtRest(spark, path, extra, keys, ms)
    val want = stateMap(IncrementalAgg.combine(
      IncrementalAgg.partial(ord, keys, ms),
      IncrementalAgg.partial(extra, keys, ms), keys))
    assert(stateMap(spark.read.parquet(path)) == want)
    assert(!fs.exists(bak))
  }

  test("derived mean matches the oracle rounding formula") {
    val st = IncrementalAgg.partial(
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val out = IncrementalAgg.withDerived(st, Seq("v"))
    assert(out.select(col("avg_v")).head.getDouble(0) == 1.5)
  }

  test("shape mismatches are refused") {
    val st = IncrementalAgg.partial(
      Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val bad = st.withColumnRenamed("sum_v", "sum_w")
    intercept[IllegalArgumentException] {
      IncrementalAgg.combine(st, bad, Seq("k"))
    }
  }

  test("txnId replay is a no-op: exactly-once under the crash window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ia_txn_")
    dir.toFile.deleteOnExit()
    val path = s"$dir/state"
    val keys = Seq("k")
    val b1 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val b2 = Seq(("a", 10.0)).toDF("k", "v")
    IncrementalAgg.applyAtRest(spark, path, b1, keys, Seq("v"),
      txnId = Some("batch-0"))
    IncrementalAgg.applyAtRest(spark, path, b2, keys, Seq("v"),
      txnId = Some("batch-1"))
    def snap() = spark.read.parquet(path)
      .select(col("k"), col("n_rows"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = snap()
    assert(want == Set(("a", 2L, 11.0), ("b", 1L, 2.0)))
    // the exact crash window from the advisory: the batch applied,
    // Spark's checkpoint did not advance, the stream replays it
    IncrementalAgg.applyAtRest(spark, path, b2, keys, Seq("v"),
      txnId = Some("batch-1"))
    assert(snap() == want, "a replayed txn must not double-count")
    // a replayed INIT batch (first-apply crash window) also no-ops
    IncrementalAgg.applyAtRest(spark, path, b1, keys, Seq("v"),
      txnId = Some("batch-0"))
    assert(snap() == want)
    // WITHOUT a txnId the fold is at-least-once by contract: the same
    // delta applied twice double-counts — the documented contrast
    IncrementalAgg.applyAtRest(spark, path, b2, keys, Seq("v"))
    assert(snap() == Set(("a", 3L, 21.0), ("b", 1L, 2.0)))
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyAtRest(spark, path, b2, keys, Seq("v"),
        txnId = Some("bad id"))
    }
  }

  test("syncFromTable keeps the rollup in lock-step with the commit log") {
    import graft.operators.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_ia_sync_")
    dir.toFile.deleteOnExit()
    val table = s"$dir/table"
    val state = s"$dir/state"
    def batch(r: Range) = r.map(i => (s"k${i % 3}", i.toDouble))
      .toDF("k", "v")
    VersionedTable.commit(batch(0 until 10), table, overwrite = true)
    // init: full snapshot of v0
    assert(IncrementalAgg.syncFromTable(spark, state, table,
      Seq("k"), Seq("v")) == Some((-1, 0)))
    // already current -> None (and no state change)
    assert(IncrementalAgg.syncFromTable(spark, state, table,
      Seq("k"), Seq("v")).isEmpty)
    // two appends land; ONE sync folds the whole window
    VersionedTable.commit(batch(10 until 16), table, overwrite = false)
    VersionedTable.commit(batch(16 until 20), table, overwrite = false)
    assert(IncrementalAgg.syncFromTable(spark, state, table,
      Seq("k"), Seq("v")) == Some((0, 2)))
    // the state equals the one-shot aggregate over the table
    val got = spark.read.parquet(state)
      .select(col("k"), col("n_rows"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = VersionedTable.read(spark, table)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want, s"$got vs $want")
    // a sync replayed against an unchanged table no-ops forever
    assert(IncrementalAgg.syncFromTable(spark, state, table,
      Seq("k"), Seq("v")).isEmpty)
    // a compaction in the window refuses (adds-only state cannot
    // absorb a rewrite); expire past the watermark says re-baseline
    VersionedTable.commit(batch(20 until 22), table, overwrite = false)
    VersionedTable.compact(spark, table, 1L << 30)
    intercept[IllegalArgumentException](IncrementalAgg.syncFromTable(
      spark, state, table, Seq("k"), Seq("v")))
    VersionedTable.expire(spark, table, keepLast = 1)
    intercept[VersionedTable.VersionExpiredException](
      IncrementalAgg.syncFromTable(spark, state, table, Seq("k"), Seq("v")))
    // a foreign (un-synced) state refuses loudly
    val foreign = s"$dir/foreign"
    IncrementalAgg.applyAtRest(spark, foreign, batch(0 until 3),
      Seq("k"), Seq("v"))
    intercept[IllegalArgumentException](IncrementalAgg.syncFromTable(
      spark, foreign, table, Seq("k"), Seq("v")))
  }

  test("syncChangesFromTable: IVM through deletes, merges, overwrites") {
    import graft.operators.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft_ia_ivm_")
    dir.toFile.deleteOnExit()
    val table = s"$dir/table"
    val state = s"$dir/state"
    def rows(rs: (Long, String, Double)*) = rs.toDF("id", "k", "v")
    def sync() = IncrementalAgg.syncChangesFromTable(
      spark, state, table, Seq("k"), Seq("v"))
    def snap() = spark.read.parquet(state)
      .select(col("k"), col("n_rows"), col("sum_v").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    def oneShot() = VersionedTable.read(spark, table)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    VersionedTable.commit(
      rows((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)),
      table, overwrite = true)
    assert(sync() == Some((-1, 0)) && snap() == oneShot())
    // an append, a predicate delete, and a three-verb merge land; ONE
    // sync folds the whole window as signed changes
    VersionedTable.commit(rows((4, "c", 10.0)), table, overwrite = false)
    VersionedTable.deleteWhere(spark, table, col("v") === 2.0)
    VersionedTable.mergeInto(spark, table,
      Seq((1L, "a", 5.0, false), (3L, "b", 0.0, true),
        (9L, "c", 7.0, false)).toDF("id", "k", "v", "_del"),
      Seq("id"), tombstoneCol = Some("_del"))
    assert(sync() == Some((0, 3)))
    assert(snap() == oneShot(), "signed folds must equal the one-shot")
    // group retirement: b lost its only row — absent, not a zero row
    assert(!snap().exists(_._1 == "b"))
    // replay + up-to-date no-op
    assert(sync().isEmpty && snap() == oneShot())
    // even an OVERWRITE (full replacement) folds through the feed —
    // the window syncFromTable must refuse
    VersionedTable.commit(rows((50, "z", 9.0), (51, "z", 1.0)),
      table, overwrite = true)
    VersionedTable.compact(spark, table, 1L << 30) // optimize: no-op feed
    assert(sync() == Some((3, 5)))
    assert(snap() == oneShot())
    assert(snap().map(_._1) == Set("z"))
    // the update-only window regression: delete/insert pairs net
    // n_rows = 0 per group with a NONZERO sum delta — a delta-side
    // zero filter would silently lose the value change
    VersionedTable.mergeInto(spark, table,
      Seq((50L, "z", 100.0), (51L, "z", 2.0)).toDF("id", "k", "v"),
      Seq("id"))
    assert(sync() == Some((5, 6)))
    assert(snap() == oneShot() && snap() == Set(("z", 2L, 102.0)),
      "an update-only window must fold its value change")
  }

  test("a txn-less apply does not erase the applied-id sidecar") {
    // the r10 advisory's mixed-mode degradation: txn applies, then a
    // txn-LESS apply swaps in new state — the applied list must carry
    // forward so a later replay of an EARLIER txn still no-ops
    val dir = java.nio.file.Files.createTempDirectory("graft_ia_mix_")
    dir.toFile.deleteOnExit()
    val path = s"$dir/state"
    val keys = Seq("k")
    val b1 = Seq(("a", 1.0)).toDF("k", "v")
    val b2 = Seq(("a", 10.0)).toDF("k", "v")
    IncrementalAgg.applyAtRest(spark, path, b1, keys, Seq("v"),
      txnId = Some("t0"))
    IncrementalAgg.applyAtRest(spark, path, b2, keys, Seq("v")) // no txn
    def snap() = spark.read.parquet(path)
      .select(col("n_rows"), col("sum_v").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = snap()
    assert(want == Set((2L, 11.0)))
    // replay of the PRE-mixed txn must still be recognized
    IncrementalAgg.applyAtRest(spark, path, b1, keys, Seq("v"),
      txnId = Some("t0"))
    assert(snap() == want,
      "a replayed txn after a txn-less apply must still no-op")
  }
}
