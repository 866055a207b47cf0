package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TarShards

class TarShardsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_tar_spec_").toFile
    d.deleteOnExit(); d
  }

  private def sample = Seq(
    (1L, "hello world", "en", "web"),
    (2L, "bonjour", "fr", "web"),
    (3L, "", "en", "book"),
    (42L, "x" * 2000, "en", "web"))
    .toDF("doc_id", "text", "lang", "source")

  test("roundtrip: ids, text bytes, and JSON sidecar fields survive") {
    val dir = tmpDir()
    TarShards.write(sample, dir.getAbsolutePath, 2, "doc_id", "text")
    val back = TarShards.read(spark, dir.getAbsolutePath)
      .select(col("id"), col("text"),
        get_json_object(col("meta"), "$.lang").as("lang"),
        get_json_object(col("meta"), "$.source").as("source"))
      .as[(Long, String, String, String)].collect().toSet
    val want = sample.as[(Long, String, String, String)].collect().toSet
    assert(back == want)
  }

  test("export is byte-deterministic: same frame, same shard md5s") {
    def shardHashes(): Map[String, String] = {
      val dir = tmpDir()
      TarShards.write(sample, dir.getAbsolutePath, 2, "doc_id", "text")
      dir.listFiles().filter(_.getName.endsWith(".tar")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getName -> java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
      }.toMap
    }
    assert(shardHashes() == shardHashes())
  }

  test("shard layout: fixed count, id-mod assignment, sorted entries") {
    val dir = tmpDir()
    TarShards.write(sample, dir.getAbsolutePath, 3, "doc_id", "text")
    val shards = dir.listFiles().filter(_.getName.endsWith(".tar"))
      .map(_.getName).sorted
    assert(shards.toSeq ==
      Seq("shard-00000.tar", "shard-00001.tar", "shard-00002.tar"))
    // entries of shard k are exactly ids ≡ k (mod 3), in id order
    val names = graft.sources.ArchiveSource.withArchive(
      s"$dir/shard-00000.tar")(_.entryNames)
    assert(names == Seq("3.txt", "3.json", "42.txt", "42.json"))
  }

  test("shards are valid tar for external tooling (system tar -t)") {
    val dir = tmpDir()
    TarShards.write(sample, dir.getAbsolutePath, 1, "doc_id", "text")
    val p = new ProcessBuilder("tar", "-tf", s"$dir/shard-00000.tar")
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream)
      .getLines().toSeq
    assert(p.waitFor() == 0, s"tar -t failed: ${out.mkString("; ")}")
    assert(out.toSet ==
      Set("1.txt", "1.json", "2.txt", "2.json", "3.txt", "3.json",
        "42.txt", "42.json"))
  }

  test("incomplete export (no _SUCCESS) is refused") {
    val dir = tmpDir()
    TarShards.write(sample, dir.getAbsolutePath, 1, "doc_id", "text")
    new java.io.File(dir, "_SUCCESS").delete()
    val e = intercept[IllegalArgumentException] {
      TarShards.read(spark, dir.getAbsolutePath)
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("empty frame: shards exist (terminators only), read is empty") {
    val dir = tmpDir()
    TarShards.write(sample.limit(0), dir.getAbsolutePath, 2,
      "doc_id", "text")
    assert(TarShards.read(spark, dir.getAbsolutePath).count() == 0)
  }

  test("null text exports as the empty entry") {
    val dir = tmpDir()
    Seq((7L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    TarShards.write(
      Seq((7L, null.asInstanceOf[String], "en"))
        .toDF("doc_id", "text", "lang"),
      dir.getAbsolutePath, 1, "doc_id", "text")
    val row = TarShards.read(spark, dir.getAbsolutePath)
      .select("id", "text").as[(Long, String)].head()
    assert(row == ((7L, "")))
  }
}
