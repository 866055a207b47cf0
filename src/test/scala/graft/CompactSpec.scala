package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Compact

class CompactSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def docs = spark.read.parquet(s"${SparkFixture.sf0001}/documents.parquet")

  private def dataFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
        Seq(f)
      else Nil
    walk(dir)
  }

  test("flat dir: 64 fragments -> 1 file, multiset preserved, no debris") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_flat_").toFile
    dir.deleteOnExit()
    docs.repartition(64).write.mode("overwrite").parquet(dir.getAbsolutePath)
    assert(dataFiles(dir).size == 64)
    val before = docs.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    val n = Compact(spark, dir.getAbsolutePath,
      targetFileBytes = 1L << 30)
    assert(n == 1, s"expected 1 file, got $n")
    assert(dataFiles(dir).size == 1)
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq == before)
    // swap left no temp/backup siblings behind
    val siblings = dir.getParentFile.listFiles()
      .map(_.getName).filter(_.contains(dir.getName + "__compact"))
    assert(siblings.isEmpty, siblings.mkString(","))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("flat dir: small target -> multiple files near target size") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_sz_").toFile
    dir.deleteOnExit()
    docs.repartition(64).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val total = dataFiles(dir).map(_.length).sum
    val target = total / 4
    val n = Compact(spark, dir.getAbsolutePath, targetFileBytes = target)
    // ceil(bytes/target) with re-encoded sizes: allow 4 +- 1
    assert(n >= 3 && n <= 5, s"expected ~4 files, got $n")
    assert(spark.read.parquet(dir.getAbsolutePath).count() == docs.count())
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("partitioned dir: per-partition file cap, partition values intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_part_").toFile
    dir.deleteOnExit()
    val src = docs.withColumn("lang", pmod(col("doc_id"), lit(3)))
    src.repartition(16)
      .write.mode("overwrite").partitionBy("lang")
      .parquet(dir.getAbsolutePath)
    // unclustered partitionBy: every task wrote into every dir
    val fragged = dataFiles(dir).size
    assert(fragged > 16, s"fixture should be fragmented, got $fragged")
    Compact(spark, dir.getAbsolutePath, partitionCols = Seq("lang"),
      targetFileBytes = 1L << 30)
    val perDir = dir.listFiles().filter(_.getName.startsWith("lang="))
      .map(d => d.getName -> dataFiles(d).size).toMap
    assert(perDir.size == 3)
    assert(perDir.values.forall(_ == 1), perDir.toString)
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.count() == src.count())
    // partition column survived the rewrite with correct values
    val got = back.groupBy("lang").count().collect()
      .map(r => r.getAs[Any]("lang").toString.toLong -> r.getLong(1)).toMap
    val want = src.groupBy("lang").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("compact + zorderBy: restores clustering while defragmenting") {
    val li = spark.read.parquet(s"${SparkFixture.sf0001}/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_z_").toFile
    dir.deleteOnExit()
    // fragmented AND unclustered
    li.repartition(48).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val total = dataFiles(dir).map(_.length).sum
    Compact(spark, dir.getAbsolutePath,
      targetFileBytes = total / 8,
      zorderBy = Seq("l_partkey", "l_suppkey"))
    val files = dataFiles(dir).size
    assert(files >= 6 && files <= 10, s"expected ~8 files, got $files")
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.count() == li.count())
    // clustering restored: avg per-file span well below global on both dims
    val per = back.groupBy(input_file_name())
      .agg((max("l_partkey") - min("l_partkey")).as("ps"),
        (max("l_suppkey") - min("l_suppkey")).as("ss"))
      .agg(avg("ps"), avg("ss")).collect()(0)
    val g = li.agg(max("l_partkey") - min("l_partkey"),
      max("l_suppkey") - min("l_suppkey")).collect()(0)
    assert(per.getDouble(0) < 0.6 * g.getLong(0))
    assert(per.getDouble(1) < 0.6 * g.getLong(1))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("multi-level partitioning: sizing walks to LEAF dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_ml_").toFile
    dir.deleteOnExit()
    val src = docs
      .withColumn("a", pmod(col("doc_id"), lit(2)))
      .withColumn("b", pmod(col("doc_id"), lit(3)))
    src.repartition(8)
      .write.mode("overwrite").partitionBy("a", "b")
      .parquet(dir.getAbsolutePath)
    Compact(spark, dir.getAbsolutePath, partitionCols = Seq("a", "b"),
      targetFileBytes = 1L << 30)
    // every LEAF dir (a=*/b=*) compacted to one file
    val leaves = dir.listFiles().filter(_.getName.startsWith("a="))
      .flatMap(_.listFiles().filter(_.getName.startsWith("b=")))
    assert(leaves.length == 6)
    leaves.foreach { leaf =>
      assert(dataFiles(leaf).size == 1, s"${leaf.getName}")
    }
    assert(spark.read.parquet(dir.getAbsolutePath).count() == src.count())
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
