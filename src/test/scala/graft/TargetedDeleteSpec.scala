package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TargetedDelete

class TargetedDeleteSpec extends AnyFunSuite {
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

  private def writeClustered(dir: java.io.File, files: Int = 10): Unit =
    docs.repartitionByRange(files, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(dir.getAbsolutePath)

  test("clustered band delete: prunes to few files, moves the rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel_").toFile
    dir.deleteOnExit()
    writeClustered(dir)
    val before = dataFiles(dir).map(f => f.getName -> f.length()).toMap
    assert(before.size == 10)
    val ids = docs.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted
    // a band spanning ~2 of 10 range-partitioned files
    val band = ids.slice(ids.length / 2, ids.length / 2 + ids.length / 5)
    val stats = TargetedDelete(
      spark, dir.getAbsolutePath, "doc_id", band.toSeq)
    assert(stats.rowsDeleted == band.length)
    assert(stats.totalFiles == 10)
    assert(stats.filesTouched <= 4,
      s"range-clustered band should touch few files, got ${stats.filesTouched}")
    // untouched files preserved byte-for-byte (same name + length: they
    // were MOVED, not rewritten)
    val after = dataFiles(dir).map(f => f.getName -> f.length()).toMap
    val preserved = before.keySet.intersect(after.keySet)
    assert(preserved.size >= before.size - stats.filesTouched)
    preserved.foreach(n => assert(before(n) == after(n), n))
    // survivors exactly the complement
    val got = spark.read.parquet(dir.getAbsolutePath).select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted
    assert(got.toSeq == ids.filterNot(band.toSet).toSeq)
    // no swap debris
    val siblings = dir.getParentFile.listFiles()
      .map(_.getName).filter(_.contains(dir.getName + "__delete"))
    assert(siblings.isEmpty, siblings.mkString(","))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("absent keys: zero files touched, table untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel_noop_").toFile
    dir.deleteOnExit()
    writeClustered(dir, files = 4)
    val before = dataFiles(dir).map(f => f.getName -> f.length()).toMap
    val stats = TargetedDelete(
      spark, dir.getAbsolutePath, "doc_id", Seq(-1L, -2L))
    assert(stats == TargetedDelete.Stats(0L, 4L, 0L))
    assert(dataFiles(dir).map(f => f.getName -> f.length()).toMap == before)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("null-key rows always survive; null delete keys rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel_null_").toFile
    dir.deleteOnExit()
    import spark.implicits._
    Seq[(java.lang.Long, String)]((1L, "a"), (null, "keepme"), (2L, "b"))
      .toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stats = TargetedDelete(spark, dir.getAbsolutePath, "k", Seq(1L, 2L))
    assert(stats.rowsDeleted == 2)
    val got = spark.read.parquet(dir.getAbsolutePath).collect()
    assert(got.length == 1 && got.head.getString(1) == "keepme")
    intercept[IllegalArgumentException] {
      TargetedDelete(spark, dir.getAbsolutePath, "k", Seq(1L, null))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("recover: crash states restore a consistent table") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel_rec_").toFile
    dir.deleteOnExit()
    writeClustered(dir, files = 6)
    val fs = new Path(dir.getAbsolutePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val src = new Path(dir.getAbsolutePath)
    val bak = new Path(src.getParent, s".${src.getName}__delete_old")
    val allIds = docs.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq

    // no crash: recover is a no-op
    assert(!graft.operators.TargetedDelete.recover(spark, dir.getAbsolutePath))

    // run a real delete, then SIMULATE "crashed between the renames":
    // move the post-delete table aside as the backup with no table dir
    val band = allIds.slice(10, 20)
    graft.operators.TargetedDelete(
      spark, dir.getAbsolutePath, "doc_id", band)
    require(fs.rename(src, bak))
    assert(graft.operators.TargetedDelete.recover(spark, dir.getAbsolutePath))
    val afterB = spark.read.parquet(dir.getAbsolutePath).select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq
    assert(afterB == allIds.filterNot(band.toSet))

    // SIMULATE "crashed mid move-back": backup holds a stale rewrite
    // (manifest-listed, contains deleted rows) plus an unmoved survivor
    val mf = new Path(src, "_delete_manifest")
    assert(fs.exists(mf), "delete leaves its manifest for audit/recovery")
    fs.mkdirs(bak)
    val files = dataFiles(dir).sortBy(_.getName)
    val staleName = {
      // read the manifest's first stale entry… or synthesize one: move a
      // real file out as a "survivor not yet moved"
      val survivor = files.head
      require(fs.rename(new Path(survivor.getAbsolutePath),
        new Path(bak, survivor.getName)))
      // plus a fake stale rewrite that must NOT come back
      val out = fs.create(new Path(bak, "stale-rewrite.parquet"), true)
      out.write(Array[Byte](1, 2, 3)); out.close()
      val mfIn = fs.open(mf)
      val lines = scala.io.Source.fromInputStream(mfIn, "UTF-8")
        .getLines().toVector
      mfIn.close()
      val withStale = (lines :+ "stale-rewrite.parquet").distinct
      val o2 = fs.create(mf, true)
      o2.write(withStale.mkString("\n").getBytes("UTF-8")); o2.close()
      "stale-rewrite.parquet"
    }
    assert(graft.operators.TargetedDelete.recover(spark, dir.getAbsolutePath))
    val names = dataFiles(dir).map(_.getName).toSet
    assert(!names.contains(staleName), "stale rewrite must not be restored")
    val afterC = spark.read.parquet(dir.getAbsolutePath).select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq
    assert(afterC == allIds.filterNot(band.toSet), "survivor moved back in")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("apply refuses while a crash-state backup exists (no data loss)") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel_bak_").toFile
    dir.deleteOnExit()
    writeClustered(dir, files = 4)
    val src = new Path(dir.getAbsolutePath)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val bak = new Path(src.getParent, s".${src.getName}__delete_old")
    fs.mkdirs(bak) // simulate a crashed move-back's leftover backup
    val e = intercept[IllegalArgumentException] {
      graft.operators.TargetedDelete(
        spark, dir.getAbsolutePath, "doc_id", Seq(1L))
    }
    assert(e.getMessage.contains("recover"))
    fs.delete(bak, true)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("hive-partitioned dir rejected with guidance") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tdel_part_").toFile
    dir.deleteOnExit()
    docs.write.mode("overwrite").partitionBy("lang")
      .parquet(dir.getAbsolutePath)
    val e = intercept[IllegalArgumentException] {
      TargetedDelete(spark, dir.getAbsolutePath, "doc_id", Seq(1L))
    }
    assert(e.getMessage.contains("applyPartitioned"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  private def writePartitioned(dir: java.io.File): Unit =
    docs.repartitionByRange(6, col("lang"), col("doc_id"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.mode("overwrite").partitionBy("lang")
      .parquet(dir.getAbsolutePath)

  test("applyPartitioned: untouched partitions never rewritten; semantics exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tdelp_").toFile
    dir.deleteOnExit()
    writePartitioned(dir)
    // delete keys confined to ONE lang → only its leaf dir is affected
    val langs = docs.select("lang").distinct()
      .as[String](spark.implicits.newStringEncoder).collect().sorted
    assert(langs.length >= 2, "fixture needs >= 2 langs for this test")
    val target = langs.head
    val band = docs.where(col("lang") === target).select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.take(10)
    val otherBefore = dataFiles(dir)
      .filterNot(_.getAbsolutePath.contains(s"lang=$target"))
      .map(f => f.getAbsolutePath -> f.length()).toMap
    val stats = TargetedDelete.applyPartitioned(
      spark, dir.getAbsolutePath, "doc_id", band.toSeq)
    assert(stats.rowsDeleted == band.length)
    // untouched partitions byte-identical (moved/left, never rewritten)
    val otherAfter = dataFiles(dir)
      .filterNot(_.getAbsolutePath.contains(s"lang=$target"))
      .map(f => f.getAbsolutePath -> f.length()).toMap
    assert(otherAfter == otherBefore)
    // survivors exactly the complement, partition column intact
    val got = spark.read.parquet(dir.getAbsolutePath)
      .select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    val all = docs.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq
    assert(got == all.filterNot(band.toSet))
    // flat dir refused by the wrapper; partition col refused as key
    intercept[IllegalArgumentException] {
      TargetedDelete.applyPartitioned(
        spark, dir.getAbsolutePath, "lang", Seq("en"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("applyPartitioned on a flat dir is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tdelp_flat_").toFile
    dir.deleteOnExit()
    writeClustered(dir, files = 2)
    val e = intercept[IllegalArgumentException] {
      TargetedDelete.applyPartitioned(
        spark, dir.getAbsolutePath, "doc_id", Seq(1L))
    }
    assert(e.getMessage.contains("not hive-partitioned"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("recoverPartitioned: repairs a leaf crash state across the tree") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_tdelp_rec_").toFile
    dir.deleteOnExit()
    writePartitioned(dir)
    val all = docs.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq
    val band = all.slice(5, 15)
    TargetedDelete.applyPartitioned(
      spark, dir.getAbsolutePath, "doc_id", band)
    // SIMULATE "crashed between the renames" on one leaf: the leaf's
    // post-delete content moves aside as its backup, leaf dir gone.
    val fs = new Path(dir.getAbsolutePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val leaf = fs.listStatus(new Path(dir.getAbsolutePath))
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath).minBy(_.getName)
    val bak = new Path(leaf.getParent, s".${leaf.getName}__delete_old")
    require(fs.rename(leaf, bak))
    // no-crash recover elsewhere is a no-op; this one repairs
    assert(TargetedDelete.recoverPartitioned(spark, dir.getAbsolutePath))
    assert(!TargetedDelete.recoverPartitioned(spark, dir.getAbsolutePath))
    val got = spark.read.parquet(dir.getAbsolutePath)
      .select("doc_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(got == all.filterNot(band.toSet))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
