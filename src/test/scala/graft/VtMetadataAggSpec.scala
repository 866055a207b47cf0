package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import graft.operators.VersionedTable

/** Metadata-only aggregates: whole-table count/min/max over a
  * versioned catalog table fold to a LocalRelation computed from the
  * manifest — zero data files opened — and only when provably exact. */
class VtMetadataAggSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def setup(): Unit = {
    if (!spark.conf.getOption("spark.sql.catalog.graft")
        .contains("graft.sources.VtCatalog"))
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.VtCatalog")
    graft.plans.VtMetadataAgg.ensureRegistered(spark)
    graft.plans.VtMaskedScanRewrite.ensureRegistered(spark)
  }

  private def tmpTable(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vtmeta_").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  private def foldsToLocal(sql: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan
      .collectLeaves().forall(_.isInstanceOf[LocalRelation])

  test("count/min/max fold from the manifest; filters block the fold") {
    setup()
    val t = tmpTable("t")
    VersionedTable.commit(
      (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      t, overwrite = true, statsCols = Seq("id"))
    val q = s"SELECT count(*) AS n, min(id) AS lo, max(id) AS hi " +
      s"FROM graft.`$t`"
    assert(foldsToLocal(q), "whole-table agg must fold to metadata")
    val r = spark.sql(q).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1000L, 0L, 999L))
    // a WHERE between aggregate and relation blocks the fold — and
    // the scan answer matches
    val f = s"SELECT count(*) AS n FROM graft.`$t` WHERE id < 10"
    assert(!foldsToLocal(f), "a filtered count must scan")
    assert(spark.sql(f).collect()(0).getLong(0) == 10L)
  }

  test("DV'd versions: count folds exactly, min/max refuse to fold") {
    setup()
    val t = tmpTable("dv")
    VersionedTable.commit(
      (0L until 100L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"),
      t, overwrite = true, statsCols = Seq("id"))
    VersionedTable.deleteWhere(spark, t, col("id") >= 90,
      deletionVectors = true)
    val c = s"SELECT count(*) AS n FROM graft.`$t`"
    assert(foldsToLocal(c),
      "a DV'd table's count is exact metadata (live = physical - masked)")
    assert(spark.sql(c).collect()(0).getLong(0) == 90L)
    // a masked row could have held the extremum: must scan, and the
    // masked rewrite must answer it right
    val m = s"SELECT max(id) AS hi FROM graft.`$t`"
    assert(!foldsToLocal(m), "max over a DV'd version must rescan")
    assert(spark.sql(m).collect()(0).getLong(0) == 89L)
  }

  test("un-indexed columns and empty tables stay exact") {
    setup()
    val t = tmpTable("u")
    VersionedTable.commit(
      (0L until 50L).map(i => (i, i * 2L)).toDF("id", "v")
        .repartition(2),
      t, overwrite = true, statsCols = Seq("id"))
    // v carries no manifest stats: the fold must decline, not guess
    val q = s"SELECT min(v) AS lo FROM graft.`$t`"
    assert(!foldsToLocal(q), "min of an un-indexed column must scan")
    assert(spark.sql(q).collect()(0).getLong(0) == 0L)
    // zero-row overwrite: count folds to 0, min folds to NULL
    VersionedTable.commit((0L until 0L).map(i => (i, i)).toDF("id", "v"),
      t, overwrite = true, statsCols = Seq("id"))
    val e = s"SELECT count(*) AS n, min(id) AS lo FROM graft.`$t`"
    assert(foldsToLocal(e))
    val r = spark.sql(e).collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("VERSION AS OF folds the pinned version's metadata") {
    setup()
    val t = tmpTable("tt")
    VersionedTable.commit((0L until 10L).map(i => (i, s"a$i"))
      .toDF("id", "s").coalesce(1), t, overwrite = true,
      statsCols = Seq("id"))
    VersionedTable.commit((10L until 30L).map(i => (i, s"b$i"))
      .toDF("id", "s").coalesce(1), t, overwrite = false)
    val q0 = s"SELECT count(*) AS n, max(id) AS hi " +
      s"FROM graft.`$t` VERSION AS OF 0"
    assert(foldsToLocal(q0))
    val r0 = spark.sql(q0).collect()(0)
    assert((r0.getLong(0), r0.getLong(1)) == (10L, 9L))
    val r1 = spark.sql(s"SELECT count(*) AS n, max(id) AS hi " +
      s"FROM graft.`$t`").collect()(0)
    assert((r1.getLong(0), r1.getLong(1)) == (30L, 29L))
  }

  test("distinct and expression aggregates never fold") {
    setup()
    val t = tmpTable("d")
    VersionedTable.commit(
      Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "s").coalesce(1),
      t, overwrite = true, statsCols = Seq("id"))
    val q = s"SELECT count(DISTINCT id) AS n FROM graft.`$t`"
    assert(!foldsToLocal(q), "count(DISTINCT) must scan")
    assert(spark.sql(q).collect()(0).getLong(0) == 2L)
    val q2 = s"SELECT count(*) + 1 AS n FROM graft.`$t`"
    assert(spark.sql(q2).collect()(0).getLong(0) == 4L)
  }
}
