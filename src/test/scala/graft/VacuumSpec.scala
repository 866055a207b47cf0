package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vacuum

class VacuumSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_vac_spec_").toFile
    d.deleteOnExit(); d
  }
  private val old = System.currentTimeMillis() - 48L * 3600 * 1000
  private def file(dir: java.io.File, name: String,
      aged: Boolean): java.io.File = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath, "x".getBytes)
    if (aged) require(f.setLastModified(old))
    f
  }
  private def subdir(dir: java.io.File, name: String,
      aged: Boolean): java.io.File = {
    val f = new java.io.File(dir, name)
    f.mkdirs()
    file(f, "part-0.parquet", aged = false)
    if (aged) require(f.setLastModified(old))
    f
  }

  test("aged temps deleted; fresh temps and live data kept") {
    val d = tmpDir()
    val liveData = file(d, "part-00000.parquet", aged = true)
    val agedTmp = file(d, ".part-00001-7.avro.tmp", aged = true)
    val freshTmp = file(d, ".shard-00002-9.tar.tmp", aged = false)
    val agedTmpDir = subdir(d, ".snap__snap_tmp", aged = true)
    val foreignHidden = file(d, ".some_other_tool_state", aged = true)
    val r = Vacuum(spark, d.getAbsolutePath, ttlMs = 3600 * 1000L)
    assert(!agedTmp.exists() && !agedTmpDir.exists())
    assert(liveData.exists() && freshTmp.exists() && foreignHidden.exists())
    assert(r.deleted.toSet ==
      Set(agedTmp, agedTmpDir).map(_.getAbsolutePath))
    assert(r.kept.contains(freshTmp.getAbsolutePath))
    assert(!r.deleted.contains(foreignHidden.getAbsolutePath) &&
      !r.kept.contains(foreignHidden.getAbsolutePath),
      "unknown hidden files are not even candidates")
  }

  test("backups: stale-with-live-sibling deleted; orphan kept forever") {
    val d = tmpDir()
    subdir(d, "state", aged = false) // the live snapshot
    val stale = subdir(d, ".state__agg_old", aged = true)
    val orphan = subdir(d, ".lost__snap_old", aged = true)
    val r = Vacuum(spark, d.getAbsolutePath, ttlMs = 3600 * 1000L)
    assert(!stale.exists(), "completed-swap backup must be vacuumed")
    assert(orphan.exists(),
      "a backup with no live sibling is the crash-recovery source")
    assert(r.kept.contains(orphan.getAbsolutePath))
  }

  test("fresh backup kept even with live sibling (swap may be mid-flight)") {
    val d = tmpDir()
    subdir(d, "state", aged = false)
    val freshBak = subdir(d, ".state__snap_old", aged = false)
    Vacuum(spark, d.getAbsolutePath, ttlMs = 3600 * 1000L)
    assert(freshBak.exists())
  }

  test("recursive walk reaches partition subdirectories") {
    val d = tmpDir()
    val part = new java.io.File(d, "source=web"); part.mkdirs()
    val junk = file(part, ".part-00000-3.avro.tmp", aged = true)
    val live = file(part, "part-00000.parquet", aged = true)
    val r = Vacuum(spark, d.getAbsolutePath, ttlMs = 0L)
    assert(!junk.exists() && live.exists())
    assert(r.deleted == Seq(junk.getAbsolutePath))
    val r2 = Vacuum(spark, d.getAbsolutePath, ttlMs = 0L,
      recursive = false)
    assert(r2.deleted.isEmpty)
  }
}
