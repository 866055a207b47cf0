package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def li = spark.read.parquet(s"${SparkFixture.sf0001}/lineitem.parquet")

  test("interleaveBits: known Morton codes") {
    // dims (x=0b011, y=0b101), 8 buckets (3 bits), 2 dims:
    // bit b of dim d -> position b*2 + d
    // x bits: b0=1->pos0, b1=1->pos2, b2=0 ; y bits: b0=1->pos1, b1=0, b2=1->pos5
    // z = 1 + 2 + 4 + 32 = 39
    val z = Seq((3, 5)).toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].head()
    assert(z == 39L)
    // identity on one dim: z == value
    val z1 = Seq(Tuple1(6)).toDF("x")
      .select(ZOrder.interleaveBits(Seq(col("x")), 8).as("z"))
      .as[Long].head()
    assert(z1 == 6L)
  }

  test("write: multiset-preserving roundtrip, exact file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_rt_").toFile
    dir.deleteOnExit()
    ZOrder.write(li, Seq("l_partkey", "l_suppkey"),
      dir.getAbsolutePath, numFiles = 8)
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.count() == li.count())
    // multiset equality via full anti-join both ways on all columns
    val cols = li.columns.toSeq
    assert(li.join(back, cols, "left_anti").isEmpty)
    assert(back.join(li, cols, "left_anti").isEmpty)
    val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 8, s"expected 8 files, got $files")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("locality: per-file span shrinks on BOTH dims (vs 1-dim sort)") {
    def spans(dir: java.io.File): (Double, Double) = {
      val per = spark.read.parquet(dir.getAbsolutePath)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("ps"),
          (max("l_suppkey") - min("l_suppkey")).as("ss"))
        .agg(avg("ps"), avg("ss")).collect()(0)
      (per.getDouble(0), per.getDouble(1))
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_z_").toFile
    val sDir = java.nio.file.Files.createTempDirectory("graft_zorder_s_").toFile
    Seq(zDir, sDir).foreach(_.deleteOnExit())
    ZOrder.write(li, Seq("l_partkey", "l_suppkey"),
      zDir.getAbsolutePath, numFiles = 16)
    // baseline: linear sort on the leading dimension only
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir.getAbsolutePath)
    val b = li.agg(max("l_partkey") - min("l_partkey"),
      max("l_suppkey") - min("l_suppkey")).collect()(0)
    val (gp, gs) = (b.getLong(0).toDouble, b.getLong(1).toDouble)
    val (zp, zs) = spans(zDir)
    val (sp, ss) = spans(sDir)
    // the linear sort nails its leading dim but leaves the second at
    // ~full span; z-order must shrink BOTH well below global
    assert(zp < 0.5 * gp, s"z partkey span $zp vs global $gp")
    assert(zs < 0.5 * gs, s"z suppkey span $zs vs global $gs")
    assert(sp < 0.2 * gp, s"sorted baseline sanity: $sp vs $gp")
    assert(ss > 0.8 * gs, s"sorted baseline should NOT cluster suppkey: $ss")
    assert(zs < 0.6 * ss, s"z-order suppkey span $zs not below sorted $ss")
    Seq(zDir, sDir).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  test("degenerate inputs: zero rows and constant dims") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_e_").toFile
    dir.deleteOnExit()
    ZOrder.write(li.limit(0), Seq("l_partkey", "l_suppkey"),
      dir.getAbsolutePath, numFiles = 4)
    assert(spark.read.parquet(dir.getAbsolutePath).count() == 0)
    val cDir = java.nio.file.Files.createTempDirectory("graft_zorder_c_").toFile
    cDir.deleteOnExit()
    val const = li.limit(100).withColumn("l_partkey", lit(7L))
    ZOrder.write(const, Seq("l_partkey", "l_suppkey"),
      cDir.getAbsolutePath, numFiles = 2)
    assert(spark.read.parquet(cDir.getAbsolutePath).count() == 100)
    // null dims survive the layout (both bucket lanes send them to the
    // curve origin; no row may be dropped)
    val nDir = java.nio.file.Files.createTempDirectory("graft_zorder_n_").toFile
    nDir.deleteOnExit()
    val withNulls = li.limit(100).withColumn("l_partkey",
      when(col("l_orderkey") % 3 === 0, lit(null)).otherwise(col("l_partkey")))
    ZOrder.write(withNulls, Seq("l_partkey", "l_suppkey"),
      nDir.getAbsolutePath, numFiles = 2)
    val backN = spark.read.parquet(nDir.getAbsolutePath)
    assert(backN.count() == 100)
    assert(backN.where(col("l_partkey").isNull).count() ==
      withNulls.where(col("l_partkey").isNull).count())
    Seq(dir, cDir, nDir).foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }
}
