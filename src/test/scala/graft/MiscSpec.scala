package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.util.Misc
import graft.sources.TfRecords

class MiscSpec extends AnyFunSuite {

  test("ichunked: lazy fixed-size chunks, ragged tail") {
    val got = Misc.ichunked(Iterator(1, 2, 3, 4, 5), 2).toSeq
    assert(got == Seq(Seq(1, 2), Seq(3, 4), Seq(5)))
    assert(Misc.ichunked(Iterator.empty[Int], 3).toSeq.isEmpty)
  }

  test("roundrobin interleaves, skipping exhausted iterators") {
    val got = Misc.roundrobin(
      Iterator("a1", "a2", "a3"), Iterator("b1"), Iterator("c1", "c2")).toSeq
    assert(got == Seq("a1", "b1", "c1", "a2", "c2", "a3"))
  }

  test("asRowOfConstants reflects UPPERCASE fields with nesting") {
    object Inner { val NESTED_VAL: Int = 7; val lower = "skip" }
    object Conf {
      val MAX_ROWS: Int = 100
      val NAME: String = "graft"
      val notConst: Double = 1.0
    }
    val row = Misc.asRowOfConstants(Conf)
    assert(row("MAX_ROWS") == 100)
    assert(row("NAME") == "graft")
    assert(!row.contains("notConst"))
    val nested = Misc.asRowOfConstants(Inner)
    assert(nested("NESTED_VAL") == 7)
  }

  test("filesystem helpers: mkdir/rm/clean/list/missingOrEmpty") {
    val root = Files.createTempDirectory("fs").toString
    val sub = s"$root/a/b"
    Misc.mkdirP(sub)
    Files.writeString(java.nio.file.Paths.get(s"$sub/f.txt"), "data")
    assert(Misc.allFilesRecursive(root).exists(_.endsWith("f.txt")))
    assert(!Misc.missingOrEmpty(s"$sub/f.txt"))
    assert(Misc.missingOrEmpty(s"$root/nope"))
    Misc.cleanDir(sub)
    assert(Misc.allFilesRecursive(sub).isEmpty)
    Misc.rmRf(root)
    assert(Misc.missingOrEmpty(root))
  }

  test("copyNFromZip thins a zip to the first n sorted entries") {
    val root = Files.createTempDirectory("zipthin").toString
    val src = s"$root/src.zip"
    val zout = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(java.nio.file.Paths.get(src)))
    Seq("c.txt", "a.txt", "b.txt").foreach { n =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      zout.write(n.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
    val dest = s"$root/out/thin.zip"
    Misc.copyNFromZip(src, dest, 2)
    val zin = new java.util.zip.ZipFile(dest)
    import scala.jdk.CollectionConverters._
    val names = zin.entries().asScala.map(_.getName).toSeq
    zin.close()
    assert(names == Seq("a.txt", "b.txt")) // sorted order, first 2
    Misc.rmRf(root)
  }

  test("isStupidMacFile matches the reference predicate") {
    assert(Misc.isStupidMacFile("/x/._foo"))
    assert(Misc.isStupidMacFile("a/.DS_Store"))
    assert(!Misc.isStupidMacFile("/x/data.parquet"))
    assert(!Misc.isStupidMacFile("dotDS_Store"))
  }

  test("runCmd captures output and exit code") {
    val (code, out) = Misc.runCmd(Seq("echo", "hello"))
    assert(code == 0 && out.trim == "hello")
    val (bad, _) = Misc.runCmd(Seq("false"))
    assert(bad != 0)
  }

  test("fnameTimestamp is sortable and collision-suffixed") {
    val a = Misc.fnameTimestamp()
    assert(a.matches("""\d{4}-\d{2}-\d{2}-\d{2}_\d{2}_\d{2}\.\w{6}"""), a)
  }

  test("parseGpuCsv parses nvidia-smi fixture (mock, as the reference tests)") {
    val csv = """0, NVIDIA GeForce RTX 3090, 24576 MiB, 1024 MiB, 23552 MiB
                |1, Tesla V100, 16384 MiB, 0 MiB, 16384 MiB""".stripMargin
    val infos = Misc.parseGpuCsv(csv)
    assert(infos.size == 2)
    assert(infos(0).name == "NVIDIA GeForce RTX 3090")
    assert(infos(0).memTotalMb == 24576 && infos(1).memFreeMb == 16384)
  }

  test("TFRecord framing round-trips with valid masked CRCs") {
    val recs = Seq("hello".getBytes, "world!".getBytes,
      Array.tabulate(1000)(_.toByte))
    val bos = new java.io.ByteArrayOutputStream()
    TfRecords.write(bos, recs.iterator)
    val back = TfRecords.records(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toSeq
    assert(back.size == 3)
    back.zip(recs).foreach { case (b, r) =>
      assert(java.util.Arrays.equals(b, r)) }
    // corrupt a data byte → CRC failure
    val corrupt = bos.toByteArray.clone()
    corrupt(13) = (corrupt(13) + 1).toByte
    intercept[IllegalArgumentException] {
      TfRecords.records(new java.io.ByteArrayInputStream(corrupt)).toSeq
    }
  }
}
