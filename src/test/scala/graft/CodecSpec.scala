package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.codec.{Tensor, SerializedFn}
import graft.sources.{ArchiveSource, ArchiveEntry}
import graft.ext.Multimodal

/** Round-trip serialization tests — the backbone pattern of the
  * reference suite (ref: oarphpy_test/test_spark.py:1154-1202
  * _check_serialization): objects → Dataset → parquet → Dataset →
  * objects, compared for equality, plus schema assertions. */
case class TensorRow(id: Long, t: Tensor)
case class ComplexRow(id: Long, t: Tensor, fn: SerializedFn,
    nested: Map[String, Seq[Double]], label: String)

class CodecSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("Tensor round-trips through parquet with the contract schema") {
    val rows = Seq(
      TensorRow(1, Tensor.fromDoubles(Array(1.0, 2.0, 3.0))),
      TensorRow(2, Tensor.fromDoubles(Array.tabulate(1000)(_ * 0.25), Seq(10L, 100L))))
    val dir = Files.createTempDirectory("tensor").toString
    rows.toDS().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[TensorRow].collect().sortBy(_.id)
    assert(back.toSeq == rows)
    // Schema contract (ref: oarphpy/spark.py:933-968, asserted at
    // oarphpy_test/test_spark.py:1100-1102): externally-readable struct.
    val tSchema = spark.read.parquet(dir).schema("t").dataType.sql.toLowerCase
    assert(tSchema.contains("shape"), tSchema)
    assert(tSchema.contains("dtype") && tSchema.contains("order"))
    assert(tSchema.contains("values") && tSchema.contains("values_packed"))
  }

  test("kitchen-sink row: tensor + fn + nesting in one frame, sparse second row") {
    // ref: the "complex row" fixture (test_spark.py:1097-1109) — every
    // codec feature in one row plus a mostly-empty row.
    val full = ComplexRow(
      id = 1L,
      t = Tensor.fromDoubles(Array.tabulate(400)(_ * 0.5), Seq(2L, 200L)),
      fn = SerializedFn(() => "lazy-payload"),
      nested = Map("k" -> Seq(2.5, 3.5)),
      label = "full")
    val sparse = ComplexRow(2L, Tensor.fromDoubles(Array(1.0)),
      SerializedFn.empty, Map.empty, null)
    val dir = Files.createTempDirectory("complex").toString
    Seq(full, sparse).toDS().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[ComplexRow].collect().sortBy(_.id)
    assert(back(0).t.toDoubles.length == 400)
    assert(back(0).t.values_packed.nonEmpty) // 400*8 > 2KiB → packed
    assert(back(0).fn.invoke[String]() == "lazy-payload")
    assert(back(0).nested("k") == Seq(2.5, 3.5))
    assert(back(1).fn.isEmpty && back(1).nested.isEmpty && back(1).label == null)
    assert(back(1).t.values == Seq(1.0)) // small → queryable values
  }

  test("SerializedFn as column data: flyweight-factory round trip") {
    // The reference's motivating pattern (ref: oarphpy/spark.py:995-1013):
    // rows carry a thunk that loads their payload on demand.
    val rows = Seq(
      (1L, SerializedFn(() => "payload-1")),
      (2L, SerializedFn(() => "payload-2")),
      (3L, SerializedFn.empty))
    val dir = Files.createTempDirectory("fn").toString
    rows.toDF("id", "fn").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[(Long, SerializedFn)]
      .collect().sortBy(_._1)
    assert(back(0)._2.invoke[String]() == "payload-1")
    assert(back(1)._2.invoke[String]() == "payload-2")
    assert(back(2)._2.isEmpty)
  }

  test("ArchiveSource: zip entries as lazy flyweights") {
    import java.util.zip.{ZipOutputStream, ZipEntry}
    val dir = Files.createTempDirectory("arch")
    val zipPath = dir.resolve("test.zip").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    val contents = Map("a.txt" -> "alpha", "sub/b.txt" -> "bravo", "c.bin" -> "x" * 1000)
    contents.foreach { case (name, data) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(data.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val ds = ArchiveSource.archiveDs(spark, zipPath)
    assert(ds.collect().map(_.name).toSet == contents.keySet)
    // flyweight: fetch on access (ref: archive_flyweight.py:86-137)
    val fetched = ArchiveSource.readBytes(ds).collect()
      .map { case (n, b) => n -> new String(b, "UTF-8") }.toMap
    assert(fetched == contents)
    // single-entry access path
    assert(new String(ArchiveEntry(zipPath, "a.txt").data, "UTF-8") == "alpha")
  }

  test("graft-archive DataSource V2: format() read with partitioned entries") {
    import java.util.zip.{ZipOutputStream, ZipEntry}
    val dir = Files.createTempDirectory("dsv2")
    val zipPath = dir.resolve("many.zip").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    (1 to 100).foreach { i =>
      zos.putNextEntry(new ZipEntry(s"f$i.txt"))
      zos.write(s"payload-$i".getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val df = spark.read.format("graft-archive")
      .option("entriesPerPartition", "16")
      .load(zipPath)
    assert(df.columns.toSeq == Seq("archive_path", "name", "content"))
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 7) // ceil(100/16)
    val row = df.where(org.apache.spark.sql.functions.col("name") === "f42.txt")
      .collect()(0)
    assert(new String(row.getAs[Array[Byte]]("content"), "UTF-8") == "payload-42")
    // column pruning + filter still work through the v2 scan
    val names = df.select("name").where("name like 'f1%'").count()
    assert(names == 12) // f1, f10..f19, f100
  }

  test("ArchiveSource: tar round trip via dependency-free USTAR reader") {
    val dir = Files.createTempDirectory("tar")
    val src = dir.resolve("data")
    Files.createDirectories(src)
    Files.writeString(src.resolve("one.txt"), "first file")
    Files.writeString(src.resolve("two.txt"), "second file with more bytes")
    val tarPath = dir.resolve("test.tar").toString
    import scala.sys.process._
    assert(Seq("tar", "-cf", tarPath, "-C", src.toString,
      "one.txt", "two.txt").! == 0)
    val ds = ArchiveSource.archiveDs(spark, tarPath)
    assert(ds.collect().map(_.name).toSet == Set("one.txt", "two.txt"))
    val bytes = ArchiveSource.readBytes(ds).collect()
      .map { case (n, b) => n -> new String(b, "UTF-8") }.toMap
    assert(bytes("one.txt") == "first file")
    assert(bytes("two.txt") == "second file with more bytes")
  }

  test("ArchiveSource: truncated tar fails loudly instead of hanging") {
    val dir = Files.createTempDirectory("trunc")
    val src = dir.resolve("data")
    Files.createDirectories(src)
    Files.writeString(src.resolve("big.txt"), "x" * 5000)
    val tarPath = dir.resolve("t.tar").toString
    import scala.sys.process._
    assert(Seq("tar", "-cf", tarPath, "-C", src.toString, "big.txt").! == 0)
    // truncate mid-payload
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(tarPath),
      java.nio.file.StandardOpenOption.WRITE)
    ch.truncate(1024); ch.close()
    intercept[Exception] {
      ArchiveSource.withArchive(tarPath)(_.entryNames)
    } // EOFException/IllegalState — anything but an infinite loop
  }

  test("Multimodal: empty/undecodable media produce a zero raster, no crash") {
    val df = Seq((1L, Array.emptyByteArray),
      (2L, Array.tabulate(64)(i => (i * 3).toByte)))
      .toDF("media_id", "content")
    val feats = Multimodal.extractFeatures(
      Multimodal.withImageMeta(df, "media_id", "content"))
      .collect()
    assert(feats.length == 2)
    feats.foreach(f =>
      assert(graft.codec.Tensor.toFloats(f.embedding).forall(_ == 0.0f)))
  }

  test("Multimodal: gray PNG encode -> REAL imageio decode is byte-exact") {
    val w = 23; val h = 11
    val px = Array.tabulate(w * h)(i => (i * 31 + 7) % 256)
    val bytes = Multimodal.encodeGrayPng(w, h, px)
    assert(Multimodal.pngSize(bytes).contains((w, h)))
    val Some((dw, dh, dec)) = Multimodal.decodeGray(bytes)
    assert(dw == w && dh == h)
    assert(dec.toSeq == px.toSeq) // lossless round trip, sample-exact
  }

  test("Multimodal: indexed/palette and 16-bit gray images decode to luma, not raw samples") {
    import java.awt.image.BufferedImage
    // Indexed image with white top row / black bottom row: the decoded
    // single band holds palette INDICES, so a raster shortcut would
    // return whatever index the writer assigned — the luma path must
    // return the palette COLORS (255 / 0) regardless of index order.
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_BYTE_INDEXED)
    (0 until 4).foreach { x =>
      img.setRGB(x, 0, 0xffffff) // white row
      img.setRGB(x, 1, 0x000000) // black row
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val Some((w, h, px)) = Multimodal.decodeGray(bos.toByteArray)
    assert(w == 4 && h == 2)
    assert(px.take(4).forall(_ == 255), s"white row decoded as ${px.take(4).toSeq}")
    assert(px.drop(4).forall(_ == 0), s"black row decoded as ${px.drop(4).toSeq}")
    // 16-bit gray PNG: single band but NOT 8-bit — must convert, and
    // stay in the 0-255 contract range.
    val img16 = new BufferedImage(4, 2, BufferedImage.TYPE_USHORT_GRAY)
    (0 until 4).foreach { x =>
      (0 until 2).foreach(y => img16.getRaster.setSample(x, y, 0, 65535))
    }
    val bos16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img16, "png", bos16)
    val Some((_, _, px16)) = Multimodal.decodeGray(bos16.toByteArray)
    assert(px16.forall(v => v >= 0 && v <= 255), s"out of contract: ${px16.toSeq}")
    assert(px16.forall(_ >= 250), s"white 16-bit gray should be ~255: ${px16.toSeq}")
  }

  test("Multimodal: REAL JPEG decode — dims match header scan, values near source") {
    val w = 32; val h = 16
    // Smooth gradient: JPEG is lossy but close on low-frequency content.
    val px = Array.tabulate(w * h)(i => (i % w) * 255 / (w - 1))
    val bytes = Multimodal.encodeGrayJpeg(w, h, px)
    assert(Multimodal.jpegSize(bytes).contains((w, h))) // SOF walk agrees
    val Some((dw, dh, dec)) = Multimodal.decodeGray(bytes)
    assert(dw == w && dh == h)
    val meanErr = px.indices.map(i => math.abs(dec(i) - px(i))).sum.toDouble / px.length
    assert(meanErr < 8.0, s"JPEG decode drifted: mean |err| = $meanErr")
  }

  test("Multimodal: binary columns + real feature extraction plumbing") {
    val jpegHeader = Array[Int](0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08,
      0x00, 0x07, 0x00, 0x09, 0x01, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    // A real 16x16 PNG with known constant value 100 in the top-left
    // 8x8 quadrant and 200 elsewhere: pooled 8x8 grid has exact means.
    val qpx = Array.tabulate(16 * 16) { i =>
      val x = i % 16; val y = i / 16
      if (x < 8 && y < 8) 100 else 200
    }
    val rows = Seq(
      (1L, jpegHeader ++ Array.tabulate(100)(_.toByte)), // header only: meta parses, decode fails -> zeros
      (2L, Multimodal.encodeGrayPng(16, 16, qpx)))
    val df = rows.toDF("media_id", "content")
    val withMeta = Multimodal.withImageMeta(df, "media_id", "content")
    val metas = withMeta.collect().sortBy(_.media_id)
    assert(metas(0).meta.format == "jpeg")
    assert(metas(0).meta.width == 9 && metas(0).meta.height == 7)
    assert(metas(1).meta.format == "png")
    assert(metas(1).meta.width == 16 && metas(1).meta.height == 16)
    val feats = Multimodal.extractFeatures(withMeta, gridW = 8, gridH = 8)
      .collect().sortBy(_.media_id)
    assert(feats.length == 2)
    feats.foreach { f =>
      assert(f.embedding.shape == Seq(8L, 8L))
      assert(f.embedding.numElements == 64)
    }
    // Undecodable -> zero tensor (defined degradation).
    assert(Tensor.toFloats(feats(0).embedding).forall(_ == 0.0f))
    // 16x16 -> 8x8 pool: each cell is a 2x2 block of one constant.
    val vals = Tensor.toFloats(feats(1).embedding)
    (0 until 64).foreach { c =>
      val expected = if (c % 8 < 4 && c / 8 < 4) 100f / 255f else 200f / 255f
      assert(math.abs(vals(c) - expected) < 1e-6f, s"cell $c: ${vals(c)}")
    }
  }

  test("AvroFiles: full type-matrix round trip incl. nulls and ts-micros") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "héllo", Array[Byte](1, 2, 3), ts),
      Row(null, null, null, null, null, null, null, null),
      Row(-9L, -8, Double.MinPositiveValue, -0.0f, false, "", Array[Byte](), ts))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      st).repartition(2)
    val dir = Files.createTempDirectory("graft_avro_spec_").toFile
    dir.deleteOnExit()
    val n = graft.sources.AvroFiles.write(df, dir.getAbsolutePath)
    assert(n == 3)
    val back = graft.sources.AvroFiles.read(spark, dir.getAbsolutePath)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      st.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().sortBy(r =>
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0))
    assert(got.length == 3)
    val full = got.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    assert(full.getInt(1) == 2 && full.getDouble(2) == 3.5 &&
      full.getFloat(3) == 4.5f && full.getBoolean(4) &&
      full.getString(5) == "héllo" &&
      full.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(full.getTimestamp(7) == ts, "exact micros through the long")
    val nulls = got.find(_.isNullAt(0)).get
    (0 until 8).foreach(i => assert(nulls.isNullAt(i), s"field $i"))
    // unsupported nested type refuses loudly
    val bad = spark.createDataFrame(
      new java.util.ArrayList[Row](), StructType(Seq(
        StructField("a", ArrayType(LongType)))))
    intercept[IllegalArgumentException] {
      graft.sources.AvroFiles.write(bad, dir.getAbsolutePath + "_bad")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("AvroFiles commit protocol: read requires _SUCCESS; temps swept") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_commit_").toFile
    dir.deleteOnExit()
    graft.sources.AvroFiles.write(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(2),
      dir.getAbsolutePath)
    val names = dir.listFiles().map(_.getName).toSet
    assert(names.contains("_SUCCESS"), names.mkString(","))
    assert(!names.exists(_.endsWith(".avro.tmp")), "attempt temps swept")
    assert(graft.sources.AvroFiles.read(spark, dir.getAbsolutePath)
      .count() == 2)
    // a failed/partial job (no marker) must be refused, not half-read
    require(new java.io.File(dir, "_SUCCESS").delete())
    val e = intercept[IllegalArgumentException] {
      graft.sources.AvroFiles.read(spark, dir.getAbsolutePath)
    }
    assert(e.getMessage.contains("_SUCCESS"))
    // a rerun of the write must re-stamp and read cleanly again
    graft.sources.AvroFiles.write(
      Seq((3L, "c")).toDF("k", "s").coalesce(1), dir.getAbsolutePath)
    assert(graft.sources.AvroFiles.read(spark, dir.getAbsolutePath)
      .count() >= 1)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
