package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZoneMapIndex

class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def li = spark.read.parquet(s"${SparkFixture.sf0001}/lineitem.parquet")

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_zm_spec_").toFile
    d.deleteOnExit(); d
  }

  test("clustered layout: a selective band opens a small file fraction") {
    val dir = tmpDir()
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    ZoneMapIndex.build(spark, dir.getAbsolutePath, Seq("l_orderkey"))
    val total = dir.listFiles().count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(total == 16)
    val lo = li.agg(min("l_orderkey")).head.getLong(0)
    val cand = ZoneMapIndex.candidateFiles(
      spark, dir.getAbsolutePath, "l_orderkey", lo, lo + 10)
    // a ~10-key band on a 16-way range-clustered layout: 1 file (2 if
    // the band straddles a range boundary)
    assert(cand.size <= 2, s"expected <=2 candidates, got ${cand.size}")
  }

  test("pruned read == plain filter, clustered AND random layouts") {
    for (clustered <- Seq(true, false)) {
      val dir = tmpDir()
      val base = if (clustered)
        li.repartitionByRange(8, col("l_orderkey"))
          .sortWithinPartitions(col("l_orderkey"))
      else li.repartition(8) // round-robin: spans all overlap
      base.write.mode("overwrite").parquet(dir.getAbsolutePath)
      ZoneMapIndex.build(spark, dir.getAbsolutePath,
        Seq("l_orderkey", "l_quantity"))
      val got = ZoneMapIndex.prunedRead(
          spark, dir.getAbsolutePath, "l_orderkey", 100L, 900L)
        .select("l_orderkey", "l_linenumber")
        .as[(Long, Int)].collect().sorted.toSeq
      val want = li.where(col("l_orderkey").between(100, 900))
        .select("l_orderkey", "l_linenumber")
        .as[(Long, Int)].collect().sorted.toSeq
      assert(got == want, s"clustered=$clustered")
    }
  }

  test("no overlapping file: empty result with the table schema") {
    val dir = tmpDir()
    li.limit(100).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ZoneMapIndex.build(spark, dir.getAbsolutePath, Seq("l_orderkey"))
    val out = ZoneMapIndex.prunedRead(
      spark, dir.getAbsolutePath, "l_orderkey", -500L, -1L)
    assert(out.count() == 0)
    assert(out.columns.toSeq == li.columns.toSeq)
  }

  test("all-null span files are pruned; rows with nulls never match") {
    val dir = tmpDir()
    // file A: real values; file B: only nulls in k
    Seq[(java.lang.Long, String)]((1L, "a"), (5L, "b"))
      .toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    Seq[(java.lang.Long, String)]((null, "n1"), (null, "n2"))
      .toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    ZoneMapIndex.build(spark, dir.getAbsolutePath, Seq("k"))
    val cand = ZoneMapIndex.candidateFiles(spark, dir.getAbsolutePath,
      "k", 0L, 10L)
    assert(cand.size == 1, "the all-null file must be pruned")
    val got = ZoneMapIndex.prunedRead(spark, dir.getAbsolutePath,
      "k", 0L, 10L).select("v").as[String].collect().toSet
    assert(got == Set("a", "b"))
  }

  test("stale manifest (files appended after build) is refused loudly") {
    val dir = tmpDir()
    li.limit(100).coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    ZoneMapIndex.build(spark, dir.getAbsolutePath, Seq("l_orderkey"))
    li.limit(50).coalesce(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val e = intercept[IllegalStateException] {
      ZoneMapIndex.prunedRead(spark, dir.getAbsolutePath,
        "l_orderkey", 0L, 10L)
    }
    assert(e.getMessage.contains("stale"))
    // rebuild repairs
    ZoneMapIndex.build(spark, dir.getAbsolutePath, Seq("l_orderkey"))
    ZoneMapIndex.prunedRead(spark, dir.getAbsolutePath,
      "l_orderkey", 0L, 10L).count() // must not throw
  }

  test("unindexed column is refused") {
    val dir = tmpDir()
    li.limit(10).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ZoneMapIndex.build(spark, dir.getAbsolutePath, Seq("l_orderkey"))
    val e = intercept[IllegalArgumentException] {
      ZoneMapIndex.candidateFiles(spark, dir.getAbsolutePath,
        "l_partkey", 0L, 10L)
    }
    assert(e.getMessage.contains("not indexed"))
  }

  test("refresh: appends indexed incrementally, vanished dropped, rebuild-free") {
    val d = tmpDir().getAbsolutePath
    li.limit(3000).repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(d)
    ZoneMapIndex.build(spark, d, Seq("l_orderkey"))
    // append two new files without touching the indexed ones
    val before = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    li.where(col("l_orderkey") > 5000).limit(500).coalesce(1)
      .write.mode("append").parquet(d)
    li.where(col("l_orderkey") <= 5000).limit(500).coalesce(1)
      .write.mode("append").parquet(d)
    intercept[IllegalStateException](
      ZoneMapIndex.prunedRead(spark, d, "l_orderkey", 1L, 100000L))
    val (fresh, dropped) = ZoneMapIndex.refresh(spark, d)
    assert(fresh == 2 && dropped == 0, s"($fresh, $dropped)")
    // pruned read now plans and equals the plain filter
    val exp = spark.read.parquet(d)
      .where(col("l_orderkey").between(1L, 100000L)).count()
    assert(ZoneMapIndex.prunedRead(spark, d, "l_orderkey", 1L, 100000L)
      .count() == exp)
    // delete one original file: refresh drops its manifest row
    val victim = new java.io.File(d).listFiles()
      .filter(f => before.contains(f.getName)).head
    require(victim.delete())
    val (f2, d2) = ZoneMapIndex.refresh(spark, d)
    assert(f2 == 0 && d2 == 1, s"($f2, $d2)")
    val exp2 = spark.read.parquet(d)
      .where(col("l_orderkey").between(1L, 100000L)).count()
    assert(ZoneMapIndex.prunedRead(spark, d, "l_orderkey", 1L, 100000L)
      .count() == exp2)
    // no drift: refresh on a fresh manifest is a no-op
    assert(ZoneMapIndex.refresh(spark, d) == ((0, 0)))
  }
}
