package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def tmpTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vt_spec_").toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
  }

  test("commit/append/overwrite versioning and time travel") {
    val t = tmpTable()
    assert(VersionedTable.commit(df(0 until 10), t, overwrite = true) == 0)
    assert(VersionedTable.commit(df(10 until 15), t, overwrite = false) == 1)
    assert(VersionedTable.commit(df(100 until 103), t, overwrite = true) == 2)
    def ids(v: Int) = VersionedTable.read(spark, t, Some(v))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(0) == (0L until 10L))
    assert(ids(1) == (0L until 15L))
    assert(ids(2) == (100L until 103L))
    // latest == explicit last version
    assert(VersionedTable.read(spark, t).count() == 3)
    assert(VersionedTable.versions(spark, t).map(v => (v.version, v.mode)) ==
      Seq((0, "overwrite"), (1, "append"), (2, "overwrite")))
  }

  test("append carries history by reference: no data file rewritten") {
    val t = tmpTable()
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    val v0Files = VersionedTable.files(spark, t, 0).toSet
    VersionedTable.commit(df(10 until 20), t, overwrite = false)
    val v1Files = VersionedTable.files(spark, t, 1).toSet
    assert(v0Files.subsetOf(v1Files),
      "append manifest must reference v0's files unchanged")
    assert((v1Files -- v0Files).nonEmpty)
  }

  test("uncommitted data files are invisible and TTL-vacuumable") {
    val t = tmpTable()
    VersionedTable.commit(df(0 until 5), t, overwrite = true)
    // simulate a crash between PUBLISH and COMMIT: a version-prefixed
    // data file with no manifest
    val stage = t + "_orphan_stage"
    df(90 until 95).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val orphan = new java.io.File(t, "v00007-part-crashed.parquet")
    require(part.renameTo(orphan))
    assert(VersionedTable.read(spark, t).count() == 5,
      "unmanifested files must be invisible to reads")
    assert(VersionedTable.vacuumUnreferenced(spark, t, 3600 * 1000L).isEmpty,
      "fresh orphan kept (writer may still commit)")
    require(orphan.setLastModified(System.currentTimeMillis() - 7200000L))
    assert(VersionedTable.vacuumUnreferenced(spark, t, 3600 * 1000L) ==
      Seq("v00007-part-crashed.parquet"))
    assert(!orphan.exists())
  }

  test("expire keeps the tail, deletes only exclusively-dead files") {
    val t = tmpTable()
    VersionedTable.commit(df(0 until 10), t, overwrite = true)
    VersionedTable.commit(df(10 until 20), t, overwrite = false)
    VersionedTable.commit(df(20 until 25), t, overwrite = true)
    val v0Files = VersionedTable.files(spark, t, 0)
    VersionedTable.expire(spark, t, keepLast = 2)
    // v0's files are still referenced by v1 (append) — must survive
    assert(v0Files.forall(n => new java.io.File(t, n).exists()),
      "files shared with a retained version must survive expire")
    assert(VersionedTable.versions(spark, t).map(_.version) == Seq(1, 2))
    intercept[IllegalArgumentException](VersionedTable.read(spark, t, Some(0)))
    // reads of retained versions unharmed
    assert(VersionedTable.read(spark, t, Some(1)).count() == 20)
    VersionedTable.expire(spark, t, keepLast = 1)
    assert(VersionedTable.versions(spark, t).map(_.version) == Seq(2))
    // now v0/v1's exclusive files are gone from disk
    assert(v0Files.forall(n => !new java.io.File(t, n).exists()))
    assert(VersionedTable.read(spark, t).count() == 5)
  }

  test("a foreign manifest advances the counter and is never clobbered") {
    val t = tmpTable()
    VersionedTable.commit(df(0 until 5), t, overwrite = true)
    // another writer committed version 1 between our reads: the next
    // commit must allocate 2, leaving the foreign manifest untouched
    val log = new java.io.File(t, "_graft_log")
    val racing = new java.io.File(log, "v00001.manifest")
    java.nio.file.Files.write(racing.toPath,
      "graft-vt-v2\noverwrite\ntxn:-\n".getBytes)
    assert(VersionedTable.commit(df(5 until 9), t, overwrite = false) == 2)
    assert(new String(java.nio.file.Files.readAllBytes(racing.toPath))
      == "graft-vt-v2\noverwrite\ntxn:-\n")
    // the append at v2 carried v1's (empty) file list + its own files
    assert(VersionedTable.read(spark, t, Some(2)).count() == 4)
  }

  test("empty table read fails loudly") {
    val t = tmpTable()
    intercept[IllegalStateException](VersionedTable.read(spark, t))
  }

  test("txnId commits are idempotent: a replayed batch is a no-op") {
    val t = tmpTable()
    assert(VersionedTable.commit(df(0 until 5), t, overwrite = true,
      txnId = Some("b0")) == 0)
    assert(VersionedTable.commit(df(5 until 9), t, overwrite = false,
      txnId = Some("b1")) == 1)
    // the crash-replay: same batch id offered again -> same version
    // returned, no new version, no duplicated rows, no new files
    val filesBefore = new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet")).length
    assert(VersionedTable.commit(df(5 until 9), t, overwrite = false,
      txnId = Some("b1")) == 1)
    assert(VersionedTable.versions(spark, t).map(_.version) == Seq(0, 1))
    assert(VersionedTable.read(spark, t).count() == 9)
    assert(new java.io.File(t).listFiles()
      .filter(_.getName.endsWith(".parquet")).length == filesBefore,
      "a replayed txn must not even stage data")
    // a NEW id commits normally; history records the ids
    assert(VersionedTable.commit(df(9 until 10), t, overwrite = false,
      txnId = Some("b2")) == 2)
    assert(VersionedTable.versions(spark, t).flatMap(_.txnId) ==
      Seq("b0", "b1", "b2"))
    intercept[IllegalArgumentException](VersionedTable.commit(
      df(0 until 1), t, overwrite = false, txnId = Some("bad\nid")))
  }

  test("compact: fewer files as a new version; rollback intact") {
    val t = tmpTable()
    // 6 tiny per-batch files via 3 appends of 2 partitions each
    (0 until 3).foreach(i => VersionedTable.commit(
      df(i * 10 until (i + 1) * 10).repartition(2), t, overwrite = false))
    assert(VersionedTable.files(spark, t, 2).size == 6)
    val cv = VersionedTable.compact(spark, t, targetFileBytes = 1L << 30)
    assert(cv == 3)
    assert(VersionedTable.files(spark, t, 3).size == 1,
      "30 rows must compact to one target-size file")
    def ids(v: Int) = VersionedTable.read(spark, t, Some(v))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(3) == (0L until 30L), "compaction is content-invisible")
    assert(ids(2) == (0L until 30L), "pre-compaction version intact")
    VersionedTable.expire(spark, t, keepLast = 1)
    assert(ids(3) == (0L until 30L))
  }

  test("randomized op-sequence model check (seeded, deterministic)") {
    // a table driven by a random mix of operations must always agree
    // with a trivial in-memory model of "content per live version"
    val rnd = new scala.util.Random(4242)
    val t = tmpTable()
    var model = Map.empty[Int, Seq[Long]] // version -> ids
    var nextBase = 0L
    VersionedTable.commit(df(0 until 5), t, overwrite = true)
    model += 0 -> (0L until 5L)
    nextBase = 100
    (1 to 18).foreach { _ =>
      val live = model.keys.toSeq.sorted
      rnd.nextInt(5) match {
        case 0 | 1 => // append a fresh chunk
          val ids = nextBase until nextBase + 3 + rnd.nextInt(5)
          nextBase = ids.end + 100
          val v = VersionedTable.commit(
            df(ids.head.toInt until ids.end.toInt), t, overwrite = false)
          model += v -> (model(live.last) ++ ids.map(_.toLong))
        case 2 => // overwrite
          val ids = nextBase until nextBase + 2 + rnd.nextInt(4)
          nextBase = ids.end + 100
          val v = VersionedTable.commit(
            df(ids.head.toInt until ids.end.toInt), t, overwrite = true)
          model += v -> ids.map(_.toLong)
        case 3 => // compact = new version, same content
          val v = VersionedTable.compact(spark, t, 1L << 30)
          model += v -> model(live.last)
        case 4 if live.size > 2 => // expire the oldest
          val keep = 1 + rnd.nextInt(live.size - 1)
          VersionedTable.expire(spark, t, keepLast = keep)
          model = model.filter(kv => live.takeRight(keep).contains(kv._1))
        case _ => ()
      }
      // invariant: every live version reads back exactly its model
      model.keys.toSeq.sorted.foreach { v =>
        val got = VersionedTable.read(spark, t, Some(v))
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        assert(got == model(v).sorted,
          s"version $v diverged: got ${got.size} want ${model(v).size}")
      }
      // invariant: vacuum never touches referenced files
      VersionedTable.vacuumUnreferenced(spark, t, 0L)
      val latest = model.keys.max
      assert(VersionedTable.read(spark, t).count() == model(latest).size)
    }
  }
}
