package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{MultiTableTxn, VersionedTable}
import graft.operators.MultiTableTxn.TableWrite

/** Multi-table transactions: several tables, ONE atomic commit point
  * (the decision file). The crash spec is the contract: with both
  * pending manifests staged and no decision, NOTHING is visible on
  * either table; the single decision promote flips both at once. */
class MultiTableTxnSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def tmp(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_mtxn_").toFile
    d.deleteOnExit()
    d
  }

  private def df(ids: Range, tag: String) =
    ids.map(i => (i.toLong, s"${tag}$i")).toDF("id", "s")

  private def ids(t: String): Seq[Long] =
    VersionedTable.read(spark, t).select("id").as[Long]
      .collect().sorted.toSeq

  test("two tables, one commit: both land together; replay no-ops") {
    val d = tmp()
    val (a, b, dec) = (s"$d/a", s"$d/b", s"$d/txns")
    VersionedTable.commit(df(0 until 5, "a"), a, overwrite = true)
    VersionedTable.commit(df(0 until 3, "b"), b, overwrite = true)
    val writes = Seq(
      TableWrite(df(100 until 104, "a"), a, overwrite = false),
      TableWrite(df(200 until 202, "b"), b, overwrite = false))
    val vs = MultiTableTxn.commit(spark, writes, dec, "tx1")
    assert(vs == Seq(1, 1))
    assert(ids(a) == ((0L until 5L) ++ (100L until 104L)))
    assert(ids(b) == ((0L until 3L) ++ (200L until 202L)))
    // audit listing shows the txn commits as real versions
    assert(VersionedTable.versions(spark, a).map(_.version) == Seq(0, 1))
    // replay (crash after decision, re-driven): same versions, nothing new
    assert(MultiTableTxn.commit(spark, writes, dec, "tx1") == Seq(1, 1))
    assert(VersionedTable.latestVersion(spark, a).contains(1))
    assert(VersionedTable.latestVersion(spark, b).contains(1))
    // normal single-table life continues after the txn
    VersionedTable.commit(df(300 until 302, "a"), a, overwrite = false)
    assert(ids(a).contains(301L))
  }

  test("crash between the promotes: all-or-nothing visibility") {
    val d = tmp()
    val (a, b, dec) = (s"$d/a", s"$d/b", s"$d/txns")
    VersionedTable.commit(df(0 until 5, "a"), a, overwrite = true)
    VersionedTable.commit(df(0 until 3, "b"), b, overwrite = true)
    val uri = MultiTableTxn.decisionUri(dec, "tx2")
    new java.io.File(dec).mkdirs()
    // simulate the coordinator dying AFTER both per-table promotes and
    // BEFORE the decision: stage both pendings directly
    VersionedTable.commitImpl(df(100 until 104, "a"), a,
      overwrite = false, txnId = Some("mtxn_tx2_0"), statsCols = Nil,
      maxRetries = 5, onBeforeManifestCommit = () => (),
      pendingTxn = Some(uri))
    VersionedTable.commitImpl(df(200 until 202, "b"), b,
      overwrite = false, txnId = Some("mtxn_tx2_1"), statsCols = Nil,
      maxRetries = 5, onBeforeManifestCommit = () => (),
      pendingTxn = Some(uri))
    // NOTHING is visible on either table — readers see pre-txn state
    assert(ids(a) == (0L until 5L))
    assert(ids(b) == (0L until 3L))
    assert(VersionedTable.latestVersion(spark, a).contains(0))
    assert(VersionedTable.versions(spark, b).map(_.version) == Seq(0))
    // explicit reads of the pending version refuse loudly
    intercept[VersionedTable.TxnInDoubtException] {
      VersionedTable.read(spark, a, Some(1)).collect()
    }
    // writers to a touched table refuse (lost-update guard)
    intercept[VersionedTable.TxnInDoubtException] {
      VersionedTable.commit(df(900 until 901, "a"), a, overwrite = false)
    }
    intercept[VersionedTable.TxnInDoubtException] {
      VersionedTable.deleteWhere(spark, a, col("id") === 0L)
    }
    // RE-DRIVING the txn rolls forward: pendings are reused (no new
    // slots), then ONE decision promote makes both visible at once
    val rawA = s"$a/_graft_log"
    def slots(p: String) = new java.io.File(p).list()
      .count(_.matches("v\\d{5}\\.manifest"))
    val slotsBefore = (slots(rawA), slots(s"$b/_graft_log"))
    val vs = MultiTableTxn.commit(spark, Seq(
      TableWrite(df(100 until 104, "a"), a, overwrite = false),
      TableWrite(df(200 until 202, "b"), b, overwrite = false)),
      dec, "tx2")
    assert(vs == Seq(1, 1))
    assert((slots(rawA), slots(s"$b/_graft_log")) == slotsBefore,
      "roll-forward must reuse the staged pendings, not re-stage")
    assert(ids(a) == ((0L until 5L) ++ (100L until 104L)))
    assert(ids(b) == ((0L until 3L) ++ (200L until 202L)))
  }

  test("abort: permanently invisible, writers unblocked, feeds skip the hole") {
    val d = tmp()
    val (a, b, dec) = (s"$d/a", s"$d/b", s"$d/txns")
    VersionedTable.commit(df(0 until 5, "a"), a, overwrite = true,
      statsCols = Seq("id"))
    VersionedTable.commit(df(0 until 3, "b"), b, overwrite = true)
    val uri = MultiTableTxn.decisionUri(dec, "tx3")
    new java.io.File(dec).mkdirs()
    VersionedTable.commitImpl(df(100 until 104, "a"), a,
      overwrite = false, txnId = Some("mtxn_tx3_0"), statsCols = Nil,
      maxRetries = 5, onBeforeManifestCommit = () => (),
      pendingTxn = Some(uri))
    // coordinator crashed mid-staging (table b never staged); operator
    // resolves the in-doubt table with abort
    assert(MultiTableTxn.abort(spark, dec, "tx3"))
    // aborted = never happened: reads, writers, audit all pre-txn
    assert(ids(a) == (0L until 5L))
    val v2 = VersionedTable.commit(df(50 until 52, "a"), a,
      overwrite = false)
    assert(v2 == 2, s"the aborted pending keeps slot 1; got $v2")
    assert(ids(a) == ((0L until 5L) ++ (50L until 52L)))
    assert(VersionedTable.versions(spark, a).map(_.version) == Seq(0, 2))
    // the change feed crosses the aborted hole: v2's predecessor is v0
    val feed = VersionedTable.readChanges(spark, a, 2)
    assert(feed.where(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == (50L until 52L))
    // incremental appends ride over the hole too
    assert(VersionedTable.readAppendsSince(spark, a, 0)
      .select("id").as[Long].collect().sorted.toSeq == (50L until 52L))
    // a committed decision can never follow an abort
    intercept[IllegalStateException] {
      MultiTableTxn.commit(spark, Seq(
        TableWrite(df(100 until 104, "a"), a, overwrite = false),
        TableWrite(df(200 until 202, "b"), b, overwrite = false)),
        dec, "tx3")
    }
    // and abort-after-commit refuses symmetrically
    MultiTableTxn.commit(spark, Seq(
      TableWrite(df(70 until 72, "a"), a, overwrite = false)), dec, "tx4")
    intercept[IllegalStateException] {
      MultiTableTxn.abort(spark, dec, "tx4")
    }
  }

  test("delta-sized txn verbs: atomic move via delete+append, merge+update") {
    val d = tmp()
    val (a, b, dec) = (s"$d/a", s"$d/b", s"$d/txns")
    // A clustered so the delete's touched set is a file subset
    VersionedTable.commit(
      df(0 until 400, "a").repartitionByRange(4, col("id"))
        .sortWithinPartitions("id"),
      a, overwrite = true, statsCols = Seq("id"))
    VersionedTable.commit(df(1000 until 1003, "b"), b, overwrite = true)
    // the classic MOVE: delete the low band from A, append it to B —
    // one atomic commit, delete staged via the DELTA verb
    val band = df(0 until 100, "a")
    val vs = MultiTableTxn.commit(spark, Seq(
      MultiTableTxn.TableDelete(a, col("id") < 100L),
      MultiTableTxn.TableWrite(band, b, overwrite = false)),
      dec, "mv")
    assert(vs == Seq(1, 1))
    assert(ids(a) == (100L until 400L))
    assert(ids(b) == ((0L until 100L) ++ (1000L until 1003L)))
    // the delete was delta-sized: untouched A files carried by reference
    val carried = VersionedTable.files(spark, a, 1).toSet
      .intersect(VersionedTable.files(spark, a, 0).toSet)
    assert(carried.nonEmpty,
      "txn delete must carry untouched files by reference")
    // merge + update in one txn
    val vs2 = MultiTableTxn.commit(spark, Seq(
      MultiTableTxn.TableMerge(a,
        df(200 until 202, "am"), Seq("id")),
      MultiTableTxn.TableUpdate(b, col("id") < 50L,
        Map("s" -> concat(lit("u_"), col("s"))))),
      dec, "mu")
    assert(vs2 == Seq(2, 2))
    assert(VersionedTable.read(spark, a).where(col("id") === 200L)
      .select("s").collect()(0).getString(0) == "am200")
    assert(VersionedTable.read(spark, b).where(col("id") === 7L)
      .select("s").collect()(0).getString(0) == "u_a7")
    assert(VersionedTable.read(spark, b).where(col("id") === 99L)
      .select("s").collect()(0).getString(0) == "a99")
    // an ABORTED delete+append move leaves both tables untouched
    val before = (ids(a), ids(b))
    val uri = MultiTableTxn.decisionUri(dec, "mvX")
    VersionedTable.deleteWhere(spark, a, col("id") >= 300L,
      txnId = Some("mtxn_mvX_0"), pendingTxn = Some(uri))
    assert(MultiTableTxn.abort(spark, dec, "mvX"))
    assert((ids(a), ids(b)) == before, "aborted move must be invisible")
    // and A accepts normal writes again
    VersionedTable.commit(df(5000 until 5002, "a"), a, overwrite = false)
    assert(ids(a).contains(5001L))
  }

  test("expire never destroys an undecided pending; aborted ones expire") {
    val d = tmp()
    val (a, dec) = (s"$d/a", s"$d/txns")
    new java.io.File(dec).mkdirs()
    VersionedTable.commit(df(0 until 5, "a"), a, overwrite = true)
    VersionedTable.commit(df(5 until 8, "a"), a, overwrite = false)
    val uri = MultiTableTxn.decisionUri(dec, "tx5")
    VersionedTable.commitImpl(df(100 until 102, "a"), a,
      overwrite = false, txnId = Some("mtxn_tx5_0"), statsCols = Nil,
      maxRetries = 5, onBeforeManifestCommit = () => (),
      pendingTxn = Some(uri))
    // keepLast=1 would drop v0,v1 — and must, but NOT the pending v2
    VersionedTable.expire(spark, a, keepLast = 1)
    def rawSlots = new java.io.File(s"$a/_graft_log").list()
      .filter(_.matches("v\\d{5}\\.manifest")).sorted.toSeq
    assert(rawSlots.contains("v00002.manifest"),
      "retention must never destroy an undecided pending")
    // decide commit: the txn's rows land; then retention may proceed
    MultiTableTxn.commit(spark, Seq(
      TableWrite(df(100 until 102, "a"), a, overwrite = false)),
      dec, "tx5")
    assert(ids(a).containsSlice(Seq(100L, 101L)))
  }

  test("replay still resolves the txn's versions after LATER commits") {
    val d = tmp()
    val (a, b, dec) = (s"$d/a", s"$d/b", s"$d/txns")
    VersionedTable.commit(df(0 until 5, "a"), a, overwrite = true)
    VersionedTable.commit(df(0 until 3, "b"), b, overwrite = true)
    val writes = Seq(
      TableWrite(df(100 until 104, "a"), a, overwrite = false),
      TableWrite(df(200 until 202, "b"), b, overwrite = false))
    assert(MultiTableTxn.commit(spark, writes, dec, "tx6") == Seq(1, 1))
    // single-table life moves on: LATER commits land on both tables,
    // pushing the txn's manifests below the latest visible version
    VersionedTable.commit(df(300 until 302, "a"), a, overwrite = false)
    VersionedTable.commit(df(400 until 402, "b"), b, overwrite = false)
    // the re-driven txn (crash-after-decision recovery) must resolve
    // the versions it COMMITTED — a tail-walk lookup stops at the new
    // latest and would report −1, contradicting the documented
    // "replay returns the landed versions" contract
    assert(MultiTableTxn.commit(spark, writes, dec, "tx6") == Seq(1, 1),
      "replay must resolve through full history, not the tail walk")
    // and nothing new landed: the replay is a pure no-op
    assert(VersionedTable.latestVersion(spark, a).contains(2))
    assert(VersionedTable.latestVersion(spark, b).contains(2))
  }
}
