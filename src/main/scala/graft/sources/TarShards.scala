package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style sharded tar EXPORT: the bridge from a curated
  * corpus at rest to the sequential-read shards a training loop
  * streams ({`<id>.txt`, `<id>.json`} entry pairs per sample, N tar
  * shards per dataset — the layout of webdataset/tarp tooling). The
  * read side already exists ([[ArchiveSource]] consumes tar
  * flyweights); this is the write side, completing the round trip.
  *
  * Wire level: hand-rolled POSIX ustar framing (512-byte headers,
  * zero-padded records, two-block terminator) mirroring the
  * [[ArchiveSource.Tar]] reader — and, like the [[TfRecords]] /
  * [[graft.ext.Multimodal]] WAV codecs, dependency-free and
  * BYTE-DETERMINISTIC: fixed mtime 0, mode 0644, empty uname/gname,
  * entries ordered by id within a shard. The same frame always
  * exports the same shard bytes, so shards diff/dedupe/cache cleanly
  * across pipeline reruns.
  *
  * Scale shape: shard assignment is a deterministic function of the id
  * (`id mod numShards`), applied executor-side — one hash shuffle to
  * co-locate each shard's rows, an in-partition sort, and each task
  * streams ONE shard to the filesystem with temp+rename commit (the
  * [[AvroFiles]] discipline: speculative/zombie duplicate attempts
  * lose the rename race; a `_SUCCESS` marker gates readers on job
  * completion). Shard size is governed by numShards — at 100 TB you
  * pick numShards = corpus_bytes / target_shard_bytes (0.1–1 GiB
  * shards keep loader seeks amortized), and tasks never hold more
  * than one entry's bytes in memory beyond the row itself.
  */
object TarShards {

  /** Export `df` as `numShards` tar shards under `dir`
    * (`shard-NNNNN.tar`), one `{id}.txt` + `{id}.json` entry pair per
    * row. `idCol` must be integral and unique; `textCol` is the sample
    * payload (null → empty); every other column lands as a string
    * field in the JSON sidecar entry. */
  def write(
      df: DataFrame, dir: String, numShards: Int,
      idCol: String, textCol: String): Unit = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val spark = df.sparkSession
    val metaCols = df.columns.toSeq.filterNot(c => c == idCol || c == textCol)
    // JSON sidecar built engine-side (to_json of a struct) so the
    // entry bytes are a pure column function — the task just writes.
    import spark.implicits._
    val prepared = df.select(
        col(idCol).cast("long").as("__id"),
        coalesce(col(textCol).cast("string"), lit("")).as("__text"),
        to_json(struct(metaCols.map(col): _*)).as("__meta"))
      .where(col("__id").isNotNull)
      .as[(Long, String, String)]
    // repartitionAndSortWithinPartitions — the secondary-sort
    // primitive: partition index IS the shard number (floorMod keeps
    // negative ids in range) and the in-partition (shard, id) sort is
    // the shuffle's own spillable merge, so a task never buffers its
    // shard in memory.
    val sharded = prepared.rdd
      .map { case (id, t, m) =>
        ((java.lang.Math.floorMod(id, numShards.toLong), id), (t, m)) }
      .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
        def numPartitions: Int = numShards
        def getPartition(key: Any): Int =
          key.asInstanceOf[(Long, Long)]._1.toInt
      })
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val out = new org.apache.hadoop.fs.Path(dir)
    val fs0 = out.getFileSystem(conf.value)
    fs0.mkdirs(out)
    fs0.delete(new org.apache.hadoop.fs.Path(out, "_SUCCESS"), false)
    sharded.foreachPartition {
        rows: Iterator[((Long, Long), (String, String))] =>
      import org.apache.hadoop.fs.Path
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
      val fs = new Path(dir).getFileSystem(conf.value)
      val tmp = new Path(dir, f".shard-$pid%05d-$attempt.tar.tmp")
      val os = fs.create(tmp, true)
      try {
        rows.foreach { case ((_, id), (text, meta)) =>
          writeEntry(os, s"$id.txt",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          writeEntry(os, s"$id.json",
            meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        os.write(new Array[Byte](1024)) // tar terminator: two 512 blocks
      } finally os.close()
      val dest = new Path(dir, f"shard-$pid%05d.tar")
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, false)
        require(fs.exists(dest),
          s"TarShards: commit rename $tmp -> $dest failed")
      }
    }
    fs0.listStatus(out).map(_.getPath)
      .filter(_.getName.endsWith(".tar.tmp"))
      .foreach(fs0.delete(_, false)) // losers of speculative races
    fs0.create(new org.apache.hadoop.fs.Path(out, "_SUCCESS"), true).close()
  }

  /** One ustar entry: 512-byte header + payload zero-padded to a
    * 512 boundary. Deterministic fields only. */
  private def writeEntry(
      os: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"TarShards: entry name over ustar's 100-byte limit: $name")
    val h = new Array[Byte](512)
    def put(s: String, off: Int): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(v: Long, off: Int, len: Int): Unit =
      // len-1 octal digits + NUL, zero-padded (the common ustar form)
      put(("%0" + (len - 1) + "o").format(v), off)
    put(name, 0)
    oct(420 /* 0644 */, 100, 8) // mode
    oct(0, 108, 8)              // uid
    oct(0, 116, 8)              // gid
    oct(data.length.toLong, 124, 12)
    oct(0, 136, 12)             // mtime: epoch — determinism over wall time
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum-as-spaces
    h(156) = '0'                // typeflag: regular file
    put("ustar", 257); h(263) = '0'; h(264) = '0' // magic + version "00"
    val cksum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put("%06o".format(cksum), 148); h(154) = 0; h(155) = ' '.toByte
    os.write(h)
    os.write(data)
    val pad = (512 - data.length % 512) % 512
    if (pad > 0) os.write(new Array[Byte](pad))
  }

  /** Read shards back as (id, text, meta-json) — [[ArchiveSource]]
    * flyweights grouped by basename, the WebDataset pairing rule.
    * Refuses a dir without `_SUCCESS` (incomplete export). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new Path(root, "_SUCCESS")),
      s"$dir has no _SUCCESS marker: the export did not complete")
    // ArchiveSource opens local files directly — strip the URI scheme.
    val shards = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.matches("shard-\\d{5}\\.tar"))
      .map(_.toUri.getPath).toSeq
    if (shards.isEmpty)
      return spark.range(0).select(col("id"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("meta"))
    import spark.implicits._
    // Listing runs EXECUTOR-side (one sequential header scan per tar),
    // one shard per task — the driver never opens an archive.
    val entries = spark.createDataset(shards).repartition(shards.size)
      .mapPartitions(_.flatMap(p =>
        ArchiveSource.withArchive(p)(_.entryNames)
          .map(n => ArchiveEntry(p, n))))
    ArchiveSource.readBytes(entries).toDF("entry", "content")
      .select(
        regexp_extract(col("entry"), "^(\\d+)\\.(txt|json)$", 1)
          .cast("long").as("id"),
        regexp_extract(col("entry"), "^(\\d+)\\.(txt|json)$", 2).as("kind"),
        col("content"))
      .where(col("id").isNotNull)
      .groupBy(col("id"))
      .agg(
        max(when(col("kind") === "txt", col("content"))).as("__t"),
        max(when(col("kind") === "json", col("content"))).as("__m"))
      .select(col("id"),
        col("__t").cast("string").as("text"),
        col("__m").cast("string").as("meta"))
  }
}
