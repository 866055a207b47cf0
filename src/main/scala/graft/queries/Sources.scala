package graft.queries

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{ArchiveSource, TarShards, TfEventLogs, TfRecords}

/** Source-format roundtrips, oracle-checked: `documents` is written to
  * the foreign format DISTRIBUTED (one file per partition, executor-
  * side) and read back through the graft source; the DuckDB oracle is
  * simply the original table, so framing, CRC, entry naming and byte
  * fidelity are all value-checked by the driver — not just spec'd.
  *
  * The fixtures land in a fresh temp dir per invocation (local-mode
  * shared FS; a cluster deployment would point the writers at shared
  * storage). Record encoding is 8-byte big-endian doc_id + UTF-8 text —
  * length-free and safe for any text content.
  */
object Sources {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private def packRecord(id: Long, text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    val bb = ByteBuffer.allocate(8 + tb.length)
    bb.putLong(id).put(tb)
    bb.array()
  }

  private def unpackRecord(bytes: Array[Byte]): (Long, String) =
    (ByteBuffer.wrap(bytes, 0, 8).getLong,
      new String(bytes, 8, bytes.length - 8, "UTF-8"))

  /** Executor-written fixtures are only visible to the driver on a
    * shared FS. These queries are driver-testbed entries, so fail FAST
    * off local mode instead of silently returning an empty frame; the
    * dir (and its recursively-registered files) is deleted at JVM exit.
    */
  private[queries] def fixtureDir(s: SparkSession, prefix: String): File = {
    require(s.sparkContext.isLocal,
      s"$prefix roundtrip fixtures require local mode (shared FS); " +
        s"master=${s.sparkContext.master}. Point the writers at shared " +
        "storage for cluster use.")
    val dir = Files.createTempDirectory(prefix).toFile
    dir.deleteOnExit()
    dir
  }

  /** Write `df` as ONE parquet file named `name` inside `dir` with a
    * pinned mtime — the building block for multi-micro-batch streaming
    * fixtures: a file source with maxFilesPerTrigger=1 processes files
    * in mtime order, so pinned mtimes make the batch sequence
    * deterministic. Fails fast if the filesystem silently ignores
    * setLastModified (the batches would reorder and the oracle would
    * fail with no hint why). */
  private[queries] def writeOrderedPart(df: DataFrame, dir: File,
      name: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("graft_ordpart_")
    // register the ROOT first (registerCleanup only walks descendants;
    // deleteOnExit is LIFO so root registered before children deletes
    // last — otherwise the emptied dir leaks)
    tmp.toFile.deleteOnExit()
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new File(dir, name)
    Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    require(dst.setLastModified(mtime),
      s"setLastModified failed for $dst — filesystem does not " +
        "support mtime updates; ordered streaming batches need it")
    registerCleanup(tmp.toFile)
  }

  /** deleteOnExit is LIFO, so register descendants after the dir itself
    * (the dir was registered at creation) in top-down walk order —
    * deletion then runs bottom-up, so nested partition directories
    * (e.g. o_orderpriority=X/part-*.parquet) empty before their parents
    * are removed. */
  private[queries] def registerCleanup(dir: File): Unit = {
    val root = dir.toPath
    val walk = Files.walk(root)
    try walk.filter(p => p != root).forEach(p => p.toFile.deleteOnExit())
    finally walk.close()
  }

  /** documents → per-partition .tfrecord files → TfRecords.readDs. */
  val srcTfrecordRoundtrip: Q = (s, d) => {
    import s.implicits._
    val dir = fixtureDir(s, "graft_tfrec_")
    documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .foreachPartition { it: Iterator[(Long, String)] =>
        if (it.hasNext) {
          val f = new File(dir, f"part-${TaskContext.getPartitionId()}%05d.tfrecord")
          val out = new BufferedOutputStream(new FileOutputStream(f))
          try TfRecords.write(out, it.map((packRecord _).tupled))
          finally out.close()
        }
      }
    registerCleanup(dir)
    TfRecords.readDs(s, dir.getAbsolutePath)
      .map { case (_, bytes) => unpackRecord(bytes) }
      .toDF("doc_id", "text")
  }

  /** documents → per-partition .zip archives → flyweight entries →
    * bulk readBytes (one archive handle per partition). */
  val srcArchiveRoundtrip: Q = (s, d) => {
    import s.implicits._
    val dir = fixtureDir(s, "graft_zip_")
    documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .foreachPartition { it: Iterator[(Long, String)] =>
        val rows = it.toSeq
        if (rows.nonEmpty) {
          val f = new File(dir, f"part-${TaskContext.getPartitionId()}%05d.zip")
          val zout = new ZipOutputStream(
            new BufferedOutputStream(new FileOutputStream(f)))
          try rows.foreach { case (id, t) =>
            zout.putNextEntry(new ZipEntry(s"doc_$id.txt"))
            zout.write(t.getBytes("UTF-8"))
            zout.closeEntry()
          } finally zout.close()
        }
      }
    registerCleanup(dir)
    // Entry listing per archive is O(#entries) names on the driver (zip
    // central directory) — the bytes only ever move executor-side.
    val zips = dir.listFiles().filter(_.getName.endsWith(".zip"))
      .map(_.getAbsolutePath).sorted
    // Zero-row input writes zero archives: a typed empty frame, not a
    // reduce-of-empty crash.
    if (zips.isEmpty) s.emptyDataset[(Long, String)].toDF("doc_id", "text")
    else {
      val entries = zips.map(z => ArchiveSource.archiveDs(s, z)).reduce(_ union _)
      ArchiveSource.readBytes(entries)
        .map { case (name, bytes) =>
          (name.stripPrefix("doc_").stripSuffix(".txt").toLong,
            new String(bytes, "UTF-8"))
        }
        .toDF("doc_id", "text")
    }
  }

  /** Tensor codec roundtrip THROUGH parquet, exercising the packed
    * path: each embedding is tiled 4× (256 doubles = 2048 B ≥ the 2 KiB
    * auto-pack threshold), encoded as a Tensor struct with a
    * little-endian packed blob, written to parquet, read back and
    * decoded executor-side. The oracle checks structure (shape, dtype,
    * blob size) and value fidelity (first/last decoded element ==
    * original embedding endpoints, widened float→double). Full
    * element-for-element fidelity is CodecSpec's job. */
  val srcTensorRoundtrip: Q = (s, d) => {
    import s.implicits._
    import graft.codec.Tensor
    val dir = fixtureDir(s, "graft_tensor_")
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val tiled = Array.fill(4)(v.map(_.toDouble).toArray).flatten
        (id, Tensor.fromDoubles(tiled, Seq(4L, v.length.toLong)))
      }
      .toDF("vec_id", "tensor")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    registerCleanup(dir)
    s.read.parquet(dir.getAbsolutePath).as[(Long, Tensor)]
      .map { case (id, t) =>
        val dv = t.toDoubles
        (id, t.numElements, t.dtype, t.values_packed.length, dv.head, dv.last)
      }
      .toDF("vec_id", "n_values", "dtype", "packed_bytes", "v_first", "v_last")
  }

  /** The DataSource V2 connector path (`spark.read.format(
    * "graft-archive")`): ONE zip holding every document, fanned across
    * input partitions by `entriesPerPartition` — the flyweight design
    * point (a single large archive parallelized on read). Fixture is
    * written executor-side from a single partition; the READ fan-out is
    * what's under test. */
  val srcArchiveDsv2: Q = (s, d) => {
    import s.implicits._
    val dir = fixtureDir(s, "graft_zipv2_")
    documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .coalesce(1)
      .foreachPartition { it: Iterator[(Long, String)] =>
        val rows = it.toSeq
        if (rows.nonEmpty) {
          val zout = new ZipOutputStream(new BufferedOutputStream(
            new FileOutputStream(new File(dir, "docs.zip"))))
          try rows.foreach { case (id, t) =>
            zout.putNextEntry(new ZipEntry(s"doc_$id.txt"))
            zout.write(t.getBytes("UTF-8"))
            zout.closeEntry()
          } finally zout.close()
        }
      }
    registerCleanup(dir)
    // Zero-row input writes no archive at all.
    if (!new File(dir, "docs.zip").exists())
      s.emptyDataset[(Long, String)].toDF("doc_id", "text")
    else s.read.format("graft-archive")
      .option("entriesPerPartition", "64")
      .load(new File(dir, "docs.zip").getAbsolutePath)
      .select(
        regexp_extract(col("name"), "doc_(\\d+)\\.txt", 1).cast("long")
          .as("doc_id"),
        col("content").cast("string").as("text"))
  }

  /** JSON-lines roundtrip: documents written as JSONL (newlines and
    * unicode in `text` escaped per JSON), read back through the JSON
    * source. Value-checks string-escaping fidelity end-to-end. */
  /** Avro OCF round-trip through the engine's own container-file
    * source/sink (no `format("avro")` connector in this environment —
    * `sources/AvroFiles` carries the wire format over the provided
    * avro core jars): documents + an events-derived timestamp column
    * out as one OCF per partition, read back distributed. The oracle
    * is the source table — the check is write→read losslessness
    * including null unions and timestamp-micros. */
  val srcAvroRoundtrip: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_avro_")
    graft.sources.AvroFiles.write(
      documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .repartition(4),
      dir.getAbsolutePath)
    registerCleanup(dir)
    graft.sources.AvroFiles.read(s, dir.getAbsolutePath)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"),
        col("n_chars"))
  }

  /** Schema EVOLUTION across parquet file generations — the corpus
    * that grew a column mid-life (every long-lived pipeline's reality):
    * generation 1 files lack `lang`, generation 2 carries it;
    * `mergeSchema` unifies on read and back-fills nulls. The oracle
    * replays the generation split with explicit NULLs. (Default reads
    * skip schema merging — one footer defines the schema — so the
    * evolved read is an explicit, documented opt-in; partition-pruned
    * scans still work on the merged schema.) */
  val srcSchemaEvolution: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_schevo_")
    val docs = documents(s, d)
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
      .coalesce(2).write.parquet(s"${dir.getAbsolutePath}/gen=1")
    docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("lang"))
      .coalesce(2).write.parquet(s"${dir.getAbsolutePath}/gen=2")
    registerCleanup(dir)
    s.read.option("mergeSchema", "true")
      .parquet(dir.getAbsolutePath)
      .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("h"),
        col("lang"), col("gen").cast("int").as("gen"))
  }

  val srcJsonlRoundtrip: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_jsonl_")
    documents(s, d).select(col("doc_id"), col("text"))
      .write.mode("overwrite").json(dir.getAbsolutePath)
    registerCleanup(dir)
    s.read.schema("doc_id BIGINT, text STRING").json(dir.getAbsolutePath)
      .select(col("doc_id"), col("text"))
  }

  /** CORRUPT-record JSONL ingest — the dirty-feed robustness lane every
    * web-scale pipeline needs: every doc_id ≡ 0 (mod 10) line is
    * deterministically mangled at write time, and the PERMISSIVE reader
    * must (a) quarantine exactly those lines into the corrupt-record
    * column (count REQUIRED in-entry) and (b) parse every clean line
    * losslessly — the oracle is the clean subset. FAILFAST would kill a
    * 100 TB job on one bad byte; DROPMALFORMED silently loses data;
    * PERMISSIVE + a quarantine count is the production posture (route
    * the quarantined lines to a dead-letter sink for reprocess). */
  val srcCorruptJsonl: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_badjsonl_")
    documents(s, d).select(col("doc_id"), col("text"))
      .select(when(pmod(col("doc_id"), lit(10)) === 0,
          concat(lit("{corrupt!"), to_json(struct(col("doc_id"),
            col("text")))))
        .otherwise(to_json(struct(col("doc_id"), col("text"))))
        .as("value"))
      .write.mode("overwrite").text(dir.getAbsolutePath)
    registerCleanup(dir)
    val read = s.read
      .schema("doc_id BIGINT, text STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.getAbsolutePath)
      .localCheckpoint() // one materialization feeds count + output
    val nBad = read.where(col("_corrupt_record").isNotNull).count()
    val nExpect = documents(s, d)
      .where(pmod(col("doc_id"), lit(10)) === 0).count()
    require(nBad == nExpect,
      s"quarantined $nBad lines, corrupted $nExpect")
    read.where(col("_corrupt_record").isNull)
      .select(col("doc_id"), col("text"))
  }

  /** CSV round-trip (header + explicit read schema — never inference, a
    * full-scan job at scale): the remaining text-format lane of the
    * source matrix. Quoting/escaping is the writer's; the oracle reads
    * the parquet table, so the check is write→read losslessness. */
  val srcCsvRoundtrip: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_csv_")
    // nullValue pinned to a sentinel on BOTH write and read so NULL and
    // "" stay distinguishable (the writer's default renders NULL as "",
    // which the emptyValue-pinned reader would resurrect as "" — a
    // silent NULL→"" lossy lane on any corpus with null text).
    // RESIDUAL (documented, pinned by OperatorSpec): a field whose
    // ENTIRE content is the literal sentinel reads back as NULL — the
    // writer doesn't quote data colliding with nullValue. That is the
    // inherent CSV trade (some byte sequence must mean NULL); corpora
    // where "\N" is a real document belong in the parquet/JSONL lanes.
    documents(s, d).select(col("doc_id"), col("text"))
      .write.mode("overwrite").option("header", "true")
      .option("nullValue", "\\N")
      .csv(dir.getAbsolutePath)
    registerCleanup(dir)
    // multiLine: embedded newlines stay inside their quoted field (the
    // default line-splitting reader would shear such records); pinned
    // emptyValue keeps "" round-tripping as "" instead of NULL.
    s.read.option("header", "true").option("multiLine", "true")
      .option("emptyValue", "").option("nullValue", "\\N")
      .schema("doc_id BIGINT, text STRING")
      .csv(dir.getAbsolutePath)
      .select(col("doc_id"), col("text"))
  }

  /** Hive-style partitioned layout: orders written `partitionBy(
    * o_orderpriority)` (the at-rest partitioning a 100 TB table lives
    * with), read back through partition discovery. Partition-column
    * values round-trip through DIRECTORY NAMES (escaped), not data
    * pages — that encoding is what's value-checked here; directory
    * pruning on a partition filter is asserted in PlanSpec. */
  val srcPartitionedRoundtrip: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_part_")
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").partitionBy("o_orderpriority")
      .parquet(dir.getAbsolutePath)
    registerCleanup(dir)
    // Zero-row input writes only _SUCCESS: no partition dirs to infer
    // a schema from.
    val hasData = Option(dir.listFiles()).getOrElse(Array.empty)
      .exists(_.isDirectory)
    if (!hasData)
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, price DOUBLE, " +
            "o_orderpriority STRING"))
    else s.read.parquet(dir.getAbsolutePath)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("o_orderpriority").cast("string").as("o_orderpriority"))
  }

  /** ORC roundtrip — the second columnar at-rest format (predicate
    * pushdown + column pruning work the same way as parquet). */
  val srcOrcRoundtrip: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_orc_")
    documents(s, d).select(col("doc_id"), col("text"))
      .write.mode("overwrite").orc(dir.getAbsolutePath)
    registerCleanup(dir)
    s.read.schema("doc_id BIGINT, text STRING").orc(dir.getAbsolutePath)
      .select(col("doc_id"), col("text"))
  }

  /** S4 DF→training-loop bridge (ShardedReader): shard `documents` on a
    * materialized key, stream every shard through the toLocalIterator
    * bridge with round-robin interleave, and re-emit the union — the
    * value check proves each row crosses the bridge exactly once with
    * byte-fidelity. The driver-side materialization is the BRIDGE ITSELF
    * (a training loop consumes rows driver/host-side by definition);
    * memory high-water stays one partition + one chunk per shard. The
    * interleave ORDER is round-robin over distinct-key discovery order —
    * engine-arbitrary, which is fine under the driver's sorted-row hash
    * (and any training loop treats stream order as arbitrary-but-fixed). */
  val srcShardedReader: Q = (s, d) => {
    import s.implicits._
    val docs = documents(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(4)).cast("int").as("shard"),
        col("text"))
    val rows = graft.operators.ShardedReader
      .interleaved(docs, "shard", chunk = 64)
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSeq
    rows.toDF("doc_id", "shard", "text")
  }

  /** X4 closures as column data (SerializedFn): each row carries a
    * serialized zero-arg closure capturing its doc_id; the struct column
    * round-trips through parquet and is INVOKED executor-side on read.
    * Oracle = the closures' computed payloads — proving the flyweight
    * factory (ref: oarphpy/spark.py:971-1088) survives storage and
    * executes, not just re-serializes. */
  val srcSerializedFn: Q = (s, d) => {
    import s.implicits._
    import graft.codec.SerializedFn
    val dir = fixtureDir(s, "graft_serfn_")
    documents(s, d).select(col("doc_id")).as[Long]
      .map(id => (id, SerializedFn(() => id * 2 + 1)))
      .toDF("doc_id", "fn")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    registerCleanup(dir)
    s.read.parquet(dir.getAbsolutePath).as[(Long, SerializedFn)]
      .map { case (id, fn) => (id, fn.invoke[Long]()) }
      .toDF("doc_id", "payload")
  }

  /** P5 nested-path predicates, driver-checked end-to-end: orders round-
    * trip through parquet with their scalars packed into a STRUCT column,
    * then a nested-path filter (`meta.priority`, `meta.total`) and a
    * nested projection read them back out. At 100 TB the load-bearing
    * property is that BOTH the filter and the projection reach the scan
    * (nested predicate pushdown + nested schema pruning — PlanSpec gates
    * the plan shape); here the driver value-checks the semantics. */
  val srcNestedRoundtrip: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_nested_")
    orders(s, d)
      .select(col("o_orderkey"),
        struct(
          col("o_orderpriority").as("priority"),
          col("o_totalprice").as("total"),
          struct(col("o_custkey").as("custkey")).as("who")).as("meta"))
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    registerCleanup(dir)
    s.read.parquet(dir.getAbsolutePath)
      .filter(col("meta.priority") === "1-URGENT" &&
        col("meta.total") > 100000.0)
      .select(col("o_orderkey"),
        col("meta.priority").as("priority"),
        round(col("meta.total"), 2).as("total"),
        col("meta.who.custkey").as("custkey"))
  }

  /** S6 TF event-log roundtrip: events become scalar training summaries
    * (step = event_id, wall_time = epoch µs, tag = event_type,
    * simple_value = value-as-float32), written as framed Event protos
    * per partition, read back through the TFSummaryReader analog. The
    * float32 narrowing is part of the contract under test (simple_value
    * IS a float in the public proto): both engines widen the same REAL
    * back to double, so the hash check covers the full encode→frame→
    * parse path bit-for-bit. Each file also carries the standard
    * file_version header record, which the reader must skip. */
  val srcTfeventsRoundtrip: Q = (s, d) => {
    import s.implicits._
    val dir = fixtureDir(s, "graft_tfev_")
    events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .as[(Long, Long, String, Double)]
      .foreachPartition { it: Iterator[(Long, Long, String, Double)] =>
        if (it.hasNext) {
          val f = new File(dir,
            f"events.out.tfevents.part-${TaskContext.getPartitionId()}%05d")
          val out = new BufferedOutputStream(new FileOutputStream(f))
          try TfEventLogs.write(out, it.map { case (id, us, typ, v) =>
            TfEventLogs.encodeEvent(us.toDouble, id,
              Seq(TfEventLogs.EventValue(typ, simpleValue = Some(v.toFloat))))
          })
          finally out.close()
        }
      }
    registerCleanup(dir)
    TfEventLogs.readSummaries(s, dir.getAbsolutePath)
      .select(col("step").as("event_id"), col("wall_time").as("wall_us"),
        col("tag").as("event_type"),
        col("simple_value").cast("double").as("value_f"))
  }

  /** WebDataset-style export round trip: documents → 4 deterministic
    * tar shards ({id}.txt + {id}.json pairs, byte-stable framing,
    * temp+rename commit + _SUCCESS gate — sources/TarShards.scala) →
    * distributed shard listing → flyweight bulk read → JSON sidecar
    * fields rejoined. The oracle is the source table: export must be
    * content-lossless. */
  val srcTarShards: Q = (s, d) => {
    val dir = fixtureDir(s, "graft_tarshard_")
    registerCleanup(dir)
    TarShards.write(
      documents(s, d).select(col("doc_id"), col("text"), col("lang"),
        col("source")),
      dir.getAbsolutePath, numShards = 4, idCol = "doc_id",
      textCol = "text")
    TarShards.read(s, dir.getAbsolutePath)
      .select(col("id").as("doc_id"),
        md5(col("text")).as("h"),
        get_json_object(col("meta"), "$.lang").as("lang"),
        get_json_object(col("meta"), "$.source").as("source"))
  }

  /** The `graft-vt` BATCH RELATION end-to-end: the table lands through
    * `df.write.format("graft-vt")` (one versioned commit, stats
    * harvested), and the read is `spark.read.format("graft-vt")` with
    * a plain `.where(...)` — no API-level pruning call anywhere. The
    * manifest-backed FileIndex receives Catalyst's own pushed data
    * filters and prunes files from the commit log's spans (gated: the
    * planned scan opens strictly fewer files than the manifest lists,
    * and plans ZERO directory listings — byte lengths ride in the
    * manifest). Result-invisible by construction; the oracle replays
    * the filters. */
  val srcVtRelation: Q = (s, d) => {
    import graft.operators.VersionedTable
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val dir = fixtureDir(s, "graft_vtrel_")
    registerCleanup(dir)
    val t = new File(dir, "li").getAbsolutePath
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.format("graft-vt").option("statsCols", "l_orderkey").save(t)
    val df = s.read.format("graft-vt").load(t)
      .where(col("l_orderkey").between(1000L, 3000L) &&
        col("l_linenumber").isin(1L, 2L, 3L))
    val idx = df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
        r.location.asInstanceOf[graft.sources.VtFileIndex]
    }.getOrElse(throw new IllegalStateException(
      "graft-vt read must plan a manifest-backed HadoopFsRelation"))
    df.count() // force planning so the pushdown gate below is honest
    val total = VersionedTable.files(s, t, 0).size
    // the strict < gate only holds when the table has >1 file AND the
    // key range can exclude at least one of them — at a tiny scale
    // factor lineitem may land in one file (or every span may overlap
    // [1000,3000]), where "no pruning" is the CORRECT plan. Keep the
    // observability hook exercised unconditionally; demand strict
    // pruning only when it is provably possible.
    require(idx.lastPlannedFiles >= 0,
      "graft-vt planning must record lastPlannedFiles")
    if (total > 1)
      require(idx.lastPlannedFiles < total,
        s"pushed filters must prune the manifest-planned scan: " +
          s"${idx.lastPlannedFiles} of $total files")
    df
  }

  val queries: Map[String, Q] = Map(
    "src_vt_relation" -> srcVtRelation,
    "src_tar_shards" -> srcTarShards,
    "src_nested_roundtrip" -> srcNestedRoundtrip,
    "src_tfevents_roundtrip" -> srcTfeventsRoundtrip,
    "src_sharded_reader" -> srcShardedReader,
    "src_serialized_fn" -> srcSerializedFn,
    "src_orc_roundtrip" -> srcOrcRoundtrip,
    "src_partitioned_roundtrip" -> srcPartitionedRoundtrip,
    "src_jsonl_roundtrip" -> srcJsonlRoundtrip,
    "src_corrupt_jsonl" -> srcCorruptJsonl,
    "src_avro_roundtrip" -> srcAvroRoundtrip,
    "src_schema_evolution" -> srcSchemaEvolution,
    "src_csv_roundtrip" -> srcCsvRoundtrip,
    "src_tfrecord_roundtrip" -> srcTfrecordRoundtrip,
    "src_archive_roundtrip" -> srcArchiveRoundtrip,
    "src_archive_dsv2" -> srcArchiveDsv2,
    "src_tensor_roundtrip" -> srcTensorRoundtrip)

  val oracles: Map[String, String] = Map(
    // Manifest-planned pruning through the relation must be
    // result-invisible: the plain two-predicate filter.
    "src_vt_relation" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 3000
        |  AND l_linenumber IN (1, 2, 3)""".stripMargin,
    // Export must be content-lossless (null text lands as the empty
    // entry; null meta fields are omitted from the JSON sidecar and
    // read back as NULL).
    "src_tar_shards" ->
      """SELECT doc_id, md5(coalesce(text, '')) AS h, lang, source
        |FROM documents""".stripMargin,
    "src_nested_roundtrip" ->
      """SELECT o_orderkey, o_orderpriority AS priority,
        |  round(o_totalprice, 2) AS total, o_custkey AS custkey
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000""".stripMargin,
    "src_tfevents_roundtrip" ->
      """SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS wall_us,
        |  event_type, CAST(CAST(value AS REAL) AS DOUBLE) AS value_f
        |FROM events""".stripMargin,
    "src_sharded_reader" ->
      """SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard, text
        |FROM documents""".stripMargin,
    "src_serialized_fn" ->
      "SELECT doc_id, doc_id * 2 + 1 AS payload FROM documents",
    "src_partitioned_roundtrip" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        |  o_orderpriority
        |FROM orders""".stripMargin,
    "src_jsonl_roundtrip" -> "SELECT doc_id, text FROM documents",
    // Only the clean 9/10 survive; the quarantine count is REQUIRED
    // in-entry (a miscount fails the query, not just the hash).
    "src_corrupt_jsonl" ->
      "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0",
    "src_avro_roundtrip" ->
      "SELECT doc_id, lang, md5(text) AS h, n_chars FROM documents",
    "src_schema_evolution" ->
      """SELECT doc_id, md5(coalesce(text, '')) AS h,
        |  CAST(NULL AS VARCHAR) AS lang, CAST(1 AS INT) AS gen
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, md5(coalesce(text, '')) AS h, lang,
        |  CAST(2 AS INT) AS gen
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin,
    "src_csv_roundtrip" -> "SELECT doc_id, text FROM documents",
    "src_orc_roundtrip" -> "SELECT doc_id, text FROM documents",
    "src_tfrecord_roundtrip" -> "SELECT doc_id, text FROM documents",
    "src_archive_roundtrip" -> "SELECT doc_id, text FROM documents",
    "src_archive_dsv2" -> "SELECT doc_id, text FROM documents",
    "src_tensor_roundtrip" ->
      """SELECT vec_id,
        |  CAST(4 * len(embedding) AS BIGINT) AS n_values,
        |  'float64' AS dtype,
        |  CAST(4 * len(embedding) * 8 AS INT) AS packed_bytes,
        |  CAST(embedding[1] AS DOUBLE) AS v_first,
        |  CAST(embedding[len(embedding)] AS DOUBLE) AS v_last
        |FROM embeddings""".stripMargin)
}
