package graft

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TfEventLogs
import graft.sources.TfEventLogs.EventValue

/** S6 TF event-log reader (ref: oarphpy/util/tfutil.py:199-302 plus the
  * public event.proto/summary.proto wire schemas). */
class TfEventLogsSpec extends AnyFunSuite {

  /** Hand-built bytes straight from the protobuf wire spec — NOT via our
    * encoder — so a symmetric encode/decode bug can't self-certify.
    * Event{wall_time=2.0, step=300, summary{value{tag="loss",
    * simple_value=0.5f}}}. */
  test("parseEvent decodes a hand-assembled wire message") {
    val bytes = Array[Int](
      0x09, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x40, // 1: double 2.0
      0x10, 0xac, 0x02,                                     // 2: varint 300
      0x2a, 0x0d,                                           // 5: len 13
      0x0a, 0x0b,                                           //   1: len 11
      0x0a, 0x04, 'l', 'o', 's', 's',                       //     1: "loss"
      0x15, 0x00, 0x00, 0x00, 0x3f                          //     2: 0.5f
    ).map(_.toByte)
    val rows = TfEventLogs.parseEvent(bytes)
    assert(rows.size == 1)
    val (step, wallTime, tag, simple, img, _, _, tensor) = rows.head
    assert(step == 300L && wallTime == 2.0 && tag == "loss" && simple == 0.5f)
    assert(img == null && tensor == null)
  }

  test("encode/parse roundtrip: scalar, image, tensor; unknown fields skipped") {
    val png = Array.tabulate[Byte](16)(_.toByte)
    val ev = TfEventLogs.encodeEvent(1723400000.25, 42L, Seq(
      EventValue("acc", simpleValue = Some(0.875f)),
      EventValue("img", imageEncoded = Some((png, 4, 4))),
      EventValue("emb", tensor = Some(Array(1.5, -2.25, 3.0)))))
    val rows = TfEventLogs.parseEvent(ev)
    assert(rows.size == 3)
    val Seq(acc, img, emb) = rows
    assert(rows.forall { case (step, wt, _, _, _, _, _, _) =>
      step == 42L && wt == 1723400000.25 })
    assert(acc._3 == "acc" && acc._4 == 0.875f)
    assert(img._3 == "img" && java.util.Arrays.equals(img._5, png) &&
      img._6 == 4 && img._7 == 4)
    assert(emb._3 == "emb" && emb._8.toSeq == Seq(1.5, -2.25, 3.0))
    // simple_value absent → NaN default, per the reference row
    assert(img._4.isNaN && emb._4.isNaN)
    // file_version header record (unknown-to-us field 3) yields no rows
    assert(TfEventLogs.parseEvent(TfEventLogs.fileVersionEvent()).isEmpty)
  }

  test("readSummaries: distributed scan, header skipped, eval split tagged") {
    val spark = SparkFixture.spark
    val dir = Files.createTempDirectory("graft_tfev_spec_").toFile
    val evalDir = new File(dir, "eval"); evalDir.mkdirs()
    def writeFile(f: File, events: Seq[Array[Byte]]): Unit = {
      val out = new BufferedOutputStream(new FileOutputStream(f))
      try TfEventLogs.write(out, events.iterator) finally out.close()
    }
    writeFile(new File(dir, "events.out.tfevents.train"), Seq(
      TfEventLogs.encodeEvent(10.0, 1, Seq(EventValue("loss", Some(1.0f)))),
      TfEventLogs.encodeEvent(20.0, 2, Seq(
        EventValue("loss", Some(0.5f)), EventValue("lr", Some(0.01f))))))
    writeFile(new File(evalDir, "events.out.tfevents.eval"), Seq(
      TfEventLogs.encodeEvent(30.0, 2, Seq(EventValue("loss", Some(0.7f))))))
    try {
      val got = TfEventLogs.readSummaries(spark, dir.getAbsolutePath)
        .selectExpr("split", "step", "wall_time", "tag", "simple_value")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getString(3), r.getFloat(4)))
        .sortBy(r => (r._1, r._2, r._4))
      assert(got.toSeq == Seq(
        ("", 1L, 10.0, "loss", 1.0f),
        ("", 2L, 20.0, "loss", 0.5f),
        ("", 2L, 20.0, "lr", 0.01f),
        ("eval", 2L, 30.0, "loss", 0.7f)))
    } finally {
      evalDir.listFiles().foreach(_.delete())
      evalDir.delete()
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("splitOf matches only a whole 'eval' path component") {
    assert(TfEventLogs.splitOf("/runs/eval/events.out.tfevents.1") == "eval")
    assert(TfEventLogs.splitOf("/runs/evaluate/events.out.tfevents.1") == "")
    assert(TfEventLogs.splitOf("file:/runs/train/events.out.x") == "")
  }
}
