package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.ThruputObserver
import graft.functions.StableHash
import graft.codec.{Tensor, SerializedFn}
import graft.ext.Multimodal

/** Pure-JVM unit tests (no Spark session) — fastest feedback layer,
  * mirroring the reference's util test tier. */
class UtilSpec extends AnyFunSuite {

  test("ThruputObserver is a monoid: merge accumulates n/bytes/time") {
    val a = ThruputObserver(name = "a").observe(10, 100, 1000000)
    val b = ThruputObserver().observe(5, 50, 500000)
    val m = a + b
    assert(m.n == 15 && m.numBytes == 150 && m.totalNanos == 1500000)
    assert(m.name == "a")
    assert((ThruputObserver.zero + a).n == a.n)
    val u = ThruputObserver.union(Seq(a, b, ThruputObserver.zero))
    assert(u.n == 15)
  }

  test("ThruputObserver percentiles and rates") {
    var o = ThruputObserver()
    (1 to 100).foreach(i => o = o.observe(1, 0, i * 1000000L))
    assert(o.percentileNanos(0.5) / 1000000 > 40)
    assert(o.percentileNanos(0.99) / 1000000 > 95)
    assert(o.ratePerSec > 0)
    assert(o.toString.contains("p95_ms"))
  }

  test("stableHash matches the md5 definition (DuckDB-portable)") {
    // echo -n 'hello' | md5sum
    assert(StableHash.stableHash("hello") == "5d41402abc4b2a76b9719d911017c592")
    assert(StableHash.stableHash("") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("hashToRgb reproduces the reference goldens exactly") {
    // ref: oarphpy_test/test_plotting.py:26-30
    assert(StableHash.hashToRgb("moof") == (145, 40, 204))
    assert(StableHash.hashToRgb(5) == (186, 204, 40))
    assert(StableHash.hashToRgb("moof") == StableHash.hashToRgb("moof"))
    val (r, g, b) = StableHash.hashToRgb("anything")
    assert(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255)
  }

  test("Tensor small arrays stay as queryable values") {
    val t = Tensor.fromDoubles(Array(1.0, 2.0, 3.0))
    assert(t.values == Seq(1.0, 2.0, 3.0))
    assert(t.values_packed.isEmpty)
    assert(t.shape == Seq(3L))
    assert(t.toDoubles.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("Tensor >= 2KiB packs to little-endian binary (ref threshold)") {
    val data = Array.tabulate(512)(_.toDouble) // 4KiB as doubles
    val t = Tensor.fromDoubles(data, Seq(8L, 64L))
    assert(t.values.isEmpty)
    assert(t.values_packed.length == 512 * 8)
    assert(t.dtype == "float64" && t.order == "C")
    assert(t.toDoubles.toSeq == data.toSeq)
    // boundary: 255 doubles = 2040 bytes < 2048 → unpacked
    assert(Tensor.fromDoubles(Array.fill(255)(1.0)).values_packed.isEmpty)
    assert(Tensor.fromDoubles(Array.fill(256)(1.0)).values.isEmpty)
  }

  test("Tensor float32 round-trip") {
    val data = Array.tabulate(1024)(i => i * 0.5f)
    val t = Tensor.fromFloats(data, Seq(1024L))
    assert(t.dtype == "float32" && t.values.isEmpty)
    assert(Tensor.toFloats(t).toSeq == data.toSeq)
  }

  test("SerializedFn round-trips a closure through bytes (flyweight pattern)") {
    val payload = 42
    val fn = SerializedFn(() => payload * 2)
    assert(!fn.isEmpty)
    assert(fn.invoke[Int]() == 84)
    assert(SerializedFn.empty.isEmpty)
    intercept[IllegalStateException](SerializedFn.empty.invoke[Int]())
  }

  test("jpegSize parses SOF dims from header bytes without decode") {
    // Minimal synthetic JPEG: SOI + SOF0 with h=7, w=9.
    val sof = Array[Int](0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08,
      0x00, 0x07, 0x00, 0x09, 0x01, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(Multimodal.jpegSize(sof).contains((9, 7)))
    assert(Multimodal.jpegSize(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("sampleFrameIndices: uniform stride, stable endpoints") {
    assert(Multimodal.sampleFrameIndices(10, 20) == (0 until 10))
    val s = Multimodal.sampleFrameIndices(100, 10)
    assert(s.size == 10 && s.head == 0 && s.last == 90)
    assert(s == s.sorted && s.distinct.size == 10)
  }

  test("wav codec: PCM16 round trip, chunk walking, malformed rejection") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 65536 - 32768).toShort)
    val wav = Multimodal.wavEncode(samples, 16000)
    assert(wav.length == 44 + 2000)
    val back = Multimodal.wavDecode(wav).get
    assert(back.sampleRate == 16000 && back.channels == 1)
    assert(back.samples.toSeq == samples.toSeq)
    // chunk walking: a LIST metadata chunk between fmt and data must be
    // skipped, not break the parse
    val bb = java.nio.ByteBuffer.allocate(wav.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(wav, 0, 36) // RIFF..fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
    bb.put(wav, 36, wav.length - 36) // data chunk
    val withList = bb.array()
    // fix RIFF size for the inserted chunk
    java.nio.ByteBuffer.wrap(withList)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 36 + 12 + 2000)
    assert(Multimodal.wavDecode(withList).get.samples.toSeq == samples.toSeq)
    // malformed: truncated, wrong magic, float format
    assert(Multimodal.wavDecode(wav.take(40)).isEmpty)
    val bad = wav.clone(); bad(0) = 'X'.toByte
    assert(Multimodal.wavDecode(bad).isEmpty)
    val floatFmt = wav.clone(); floatFmt(20) = 3 // IEEE float tag
    assert(Multimodal.wavDecode(floatFmt).isEmpty)
    // frame energies: exact partial last frame
    val fr = Multimodal.frameSumSquares(Array[Short](3, -4, 5), 2)
    assert(fr == Seq((0, 2, 25L), (1, 1, 25L)))
  }

  test("hex60_to_long: exact BigInteger parity incl. values double would round") {
    val spark = SparkFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // '8000000000000001' region: 2^59 + 1 is NOT representable as a
    // double — the long path must keep the +1 (the double sibling's
    // rounding is exactly why this expression exists).
    val cases = Seq(
      "800000000000001aaa", // 2^59 + 1 after 15 chars
      "fffffffffffffff",    // 2^60 - 1
      "000000000000000",
      "0123456789abcdef",
      "DEADBEEFCAFEBABE",   // uppercase path
      "ab")                 // short string
    val got = cases.toDF("s")
      .select(graft.functions.VectorFunctions.hex60_to_long(col("s")))
      .as[Long].collect()
    val want = cases.map { s =>
      s.take(15).foldLeft(0L)((v, c) =>
        (v << 4) | java.lang.Integer.parseInt(c.toString, 16))
    }
    assert(got.toSeq == want)
    assert(want(0) == (1L << 59) + 1)
    assert(want(0).toDouble.toLong != want(0), "double sibling would round")
    // parity with the md5-prefix conv() form it replaces
    val texts = (0 until 100).map(i => s"doc $i").toDF("t")
    val both = texts.select(
      graft.functions.VectorFunctions.hex60_to_long(md5(col("t"))).as("a"),
      conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("b"))
      .where(col("a") =!= col("b")).count()
    assert(both == 0L)
  }
}
