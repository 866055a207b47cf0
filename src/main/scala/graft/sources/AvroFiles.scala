package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink over the provided avro core jars
  * (Spark ships no `format("avro")` connector in this environment, so
  * the engine carries its own distributed reader/writer — the
  * `TfRecords`/`ArchiveSource` discipline: wire-level format handling
  * in executor-local code, Spark for distribution).
  *
  * Avro is the de-facto Kafka-dump / CDC-log container a training
  * pipeline ingests alongside parquet; this implements the OCF
  * (object container file) layout via the public Avro API:
  * schema-embedding header, sync-marked blocks, null-union nullability.
  *
  * Type surface: the flat primitive subset a log record needs — long,
  * int, double, float, boolean, string, bytes, and timestamp-micros
  * (logicalType on long), each nullable via `["null", T]` unions.
  * Nested records are out of scope by design (the engine's nested
  * stories live on parquet; Avro is the INGEST format here).
  *
  * Scale shape: write = one OCF per input partition (mapPartitions,
  * no shuffle); read = one task per file (Avro blocks ARE splittable
  * by sync markers — per-file tasks keep the reader dependency-free;
  * at 100 TB the ingest step's parallelism is the file count, which a
  * Kafka dump makes large by construction).
  */
object AvroFiles {

  private def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          val s = Schema.create(Schema.Type.LONG)
          org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
        case t => throw new IllegalArgumentException(
          s"AvroFiles supports flat primitives, got ${t.simpleString} " +
            s"for field ${f.name}")
      }
      val sch =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def fromAvroSchema(s: Schema): StructType = {
    def unwrap(f: Schema): (Schema, Boolean) = f.getType match {
      case Schema.Type.UNION =>
        val ts = f.getTypes.asScala
        val nonNull = ts.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union $f")
        (nonNull.head, ts.size != nonNull.size)
      case _ => (f, false)
    }
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = unwrap(f.schema())
      val dt = t.getType match {
        case Schema.Type.LONG =>
          if (t.getLogicalType != null &&
              t.getLogicalType.getName == "timestamp-micros") TimestampType
          else LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"AvroFiles: unsupported avro type $other for ${f.name}")
      }
      StructField(f.name, dt, nullable)
    })
  }

  /** Write one Avro OCF per partition. Returns rows written.
    *
    * Commit protocol (the two failure modes a bare create-final-name
    * sink corrupts on): each task ATTEMPT writes to a dot-prefixed
    * temp name unique to the attempt, then renames onto the final
    * `part-NNNNN.avro` on task success — a speculative or zombie
    * duplicate attempt either loses the rename race (and deletes its
    * temp) or atomically replaces a complete file with another
    * complete file, never interleaves bytes. The driver stamps
    * `_SUCCESS` only after the whole job returns and sweeps leftover
    * attempt temps; [[read]] REQUIRES the marker, so a failed job's
    * partial output is never consumed as a complete dataset. */
  def write(df: DataFrame, dir: String, codec: String = "snappy"): Long = {
    val spark = df.sparkSession
    val st = df.schema
    val avroJson = toAvroSchema(st, "GraftRecord").toString
    val conf0 = spark.sessionState.newHadoopConf()
    val outDir = new Path(dir)
    val fs0 = outDir.getFileSystem(conf0)
    // A marker from a PREVIOUS write must not vouch for this one.
    fs0.delete(new Path(outDir, "_SUCCESS"), false)
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf0))
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val fs = new Path(dir).getFileSystem(confB.value.value)
      fs.mkdirs(new Path(dir))
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmpPath = new Path(dir, f".part-$pid%05d-$attempt.avro.tmp")
      val out = fs.create(tmpPath, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
      w.create(schema, out)
      var n = 0L
      try {
        rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.length) {
            val v =
              if (row.isNullAt(i)) null
              else st(i).dataType match {
                case BinaryType =>
                  java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
                case TimestampType =>
                  // java.sql.Timestamp → exact epoch micros: whole
                  // seconds from getTime (floorDiv drops the millis
                  // getNanos re-covers), sub-second entirely from nanos
                  val ts = row.getAs[java.sql.Timestamp](i)
                  java.lang.Long.valueOf(
                    math.floorDiv(ts.getTime, 1000L) * 1000000L +
                      ts.getNanos / 1000L)
                case _ => row.get(i)
              }
            rec.put(i, v)
            i += 1
          }
          w.append(rec)
          n += 1
        }
      } finally w.close() // closes the stream
      // Task-success commit: rename temp onto the final name. A lost
      // race means another attempt of THIS partition already committed
      // a complete file — drop ours.
      val dest = new Path(dir, f"part-$pid%05d.avro")
      fs.delete(dest, false) // stale file from a prior overwrite write
      if (!fs.rename(tmpPath, dest)) {
        fs.delete(tmpPath, false)
        if (!fs.exists(dest)) throw new java.io.IOException(
          s"AvroFiles: commit rename $tmpPath -> $dest failed")
      }
      Iterator.single(n)
    }.collect()
    // Job-level commit: sweep orphaned attempt temps, then stamp.
    fs0.listStatus(outDir).map(_.getPath)
      .filter(p => p.getName.startsWith(".part-") &&
        p.getName.endsWith(".avro.tmp"))
      .foreach(p => fs0.delete(p, false))
    fs0.create(new Path(outDir, "_SUCCESS"), true).close()
    counts.sum
  }

  /** Distributed read: one task per .avro file; schema from the first
    * file's embedded header (all files share a writer schema by the
    * write contract). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    require(fs.exists(new Path(d, "_SUCCESS")),
      s"$dir has no _SUCCESS marker: the write job did not complete — " +
        "refusing to read a possibly-partial dataset")
    val files = fs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val headSchema = {
      val in = new FsInput(new Path(files.head), conf)
      val r = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val st = fromAvroSchema(headSchema)
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val n = st.length
    val types = st.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { file =>
        val in = new FsInput(new Path(file), confB.value.value)
        val r = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; r.close() }
        // close on task end too: a consumer that stops early (limit,
        // take) would otherwise leak the handle until GC
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = !closed && r.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): Row = {
            val rec = r.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              val v = rec.get(i)
              vals(i) =
                if (v == null) null
                else types(i) match {
                  case StringType => v.toString // Utf8 → String
                  case BinaryType =>
                    val bb = v.asInstanceOf[java.nio.ByteBuffer]
                    val a = new Array[Byte](bb.remaining()); bb.get(a); a
                  case TimestampType =>
                    val us = v.asInstanceOf[java.lang.Long].longValue()
                    val ts = new java.sql.Timestamp(math.floorDiv(us, 1000L))
                    ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
                    ts
                  case _ => v
                }
              i += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, st)
  }
}
