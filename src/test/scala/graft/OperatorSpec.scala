package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._

class OperatorSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("UnionDfs null-pads missing columns and unions by name") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 3.5)).toDF("id", "score")
    val u = UnionDfs(a, b).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "name", "score"))
    val rows = u.collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 3.5)
  }

  test("UnionDfs widens nested nullability instead of rejecting it") {
    import org.apache.spark.sql.types._
    // same element type, different containsNull → widened, not an error
    val a = Seq(Tuple1(Seq(1L))).toDF("xs") // containsNull=false
    val bSchema = StructType(Seq(
      StructField("xs", ArrayType(LongType, containsNull = true))))
    val b = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(Seq(2L, 3L))), bSchema)
    val u = UnionDfs(a, b)
    assert(u.count() == 2)
  }

  test("MiscSpec.runCmd missing binary returns 127, not an exception") {
    val (code, msg) = graft.util.Misc.runCmd(Seq("definitely-not-a-binary-xyz"))
    assert(code == 127 && msg.nonEmpty)
    assert(graft.util.Misc.getGpuInfos != null) // graceful on GPU-less host
  }

  test("UnionDfs rejects conflicting column types (reference error contract)") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, 3.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException](UnionDfs(a, b))
    assert(e.getMessage.contains("Conflicting types"))
    assert(e.getMessage.contains("v"))
  }

  test("BalancedSample equalizes categories in expectation (multi-seed)") {
    // Reference fixture shape: categories {a:10, b:100, c:1000}, mean
    // per-category counts over several seeds within rtol 0.3
    // (ref: oarphpy_test/test_spark.py:265-346).
    val df = ((1 to 10).map(i => ("a", i)) ++
      (1 to 100).map(i => ("b", i)) ++
      (1 to 1000).map(i => ("c", i))).toDF("cls", "v").cache()
    val seeds = Seq(0L, 100L, 200L, 300L, 400L)
    val sums = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    seeds.foreach { seed =>
      BalancedSample(df, "cls", seed = seed)
        .groupBy("cls").count().collect()
        .foreach(r => sums(r.getString(0)) += r.getLong(1))
    }
    // target per category = min count = 10; mean within rtol 0.3
    Seq("a", "b", "c").foreach { c =>
      val mean = sums(c).toDouble / seeds.size
      assert(math.abs(mean - 10.0) <= 3.0 + 1e-9, s"$c mean=$mean sums=$sums")
    }
    df.unpersist()
  }

  test("GlobalRank.withRowNumber == unpartitioned-window row_number") {
    // Deliberately skewed + duplicated values across many partitions.
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("v", (col("id") * 37 % 501).cast("double"))
      .repartition(13)
    val got = GlobalRank.withRowNumber(df, "rn", Seq(col("v"), col("id")))
    val want = df.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))))
    assert(got.select("id", "v", "rn").except(want.select("id", "v", "rn"))
      .isEmpty)
    assert(got.count() == 5000)
  }

  test("GlobalRank.withNtile == SQL ntile for n % buckets != 0") {
    val df = spark.range(0, 1003).toDF("id")
      .withColumn("v", (col("id") * 7919 % 997).cast("double"))
      .repartition(7)
    val got = GlobalRank.withNtile(df, "t", 10, Seq(col("v"), col("id")))
    val want = df.withColumn("t", ntile(10).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))))
    assert(got.select("id", "t").except(want.select("id", "t")).isEmpty)
  }

  test("BalancedSample is deterministic: same seed, same exact rows") {
    val df = ((1 to 10).map(i => ("a", i)) ++
      (1 to 500).map(i => ("b", i))).toDF("cls", "v")
    val s1 = BalancedSample(df, "cls", seed = 42L).collect().toSet
    val s2 = BalancedSample(df, "cls", seed = 42L).collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
  }

  test("approx_percentile within 1% of the exact rank statistic") {
    val li = graft.queries.Tables.lineitem(spark, SparkFixture.sf0001)
    val Seq(approx, exact) = Seq(
      li.select(expr("approx_percentile(l_extendedprice, 0.5, 10000)")),
      li.select(expr("percentile(l_extendedprice, 0.5)")))
      .map(_.head().getDouble(0))
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }

  test("DfHistogram matches numpy semantics on range(0,101)") {
    // 101 values 0..100 in 50 bins of width 2: every bin gets 2, the
    // last (closed) bin gets 3 — the reference's golden shape
    // (ref: oarphpy_test/test_plotting.py:34-60).
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val r = DfHistogram(df, "v", numBins = 50)
    assert(r.edges.head == 0.0 && r.edges.last == 100.0)
    assert(r.counts.take(49).forall(_ == 2L), r.counts.mkString(","))
    assert(r.counts.last == 3L)
    assert(r.counts.sum == 101L)
  }

  test("DfHistogram reference goldens: range(101) and squares") {
    // ref: oarphpy_test/test_plotting.py:38-60
    val df = (0 to 100).map(x => (x.toDouble, (x * x).toDouble)).toDF("a", "b")
    val h1 = DfHistogram(df, "a", numBins = 1)
    assert(h1.counts.toSeq == Seq(101L))
    assert(h1.edges.toSeq == Seq(0.0, 100.0))
    val h2 = DfHistogram(df, "a", numBins = 2)
    assert(h2.counts.toSeq == Seq(50L, 51L))
    val h4 = DfHistogram(df, "b", numBins = 4)
    assert(h4.counts.toSeq == Seq(50L, 21L, 16L, 14L), h4.counts.mkString(","))
    assert(h4.edges.toSeq == Seq(0.0, 2500.0, 5000.0, 7500.0, 10000.0))
  }

  test("DfHistogram handles constant column and nulls") {
    val df = Seq(Some(5.0), Some(5.0), None, Some(5.0)).toDF("v")
    val r = DfHistogram(df, "v", numBins = 10)
    assert(r.counts.sum == 3L)
    assert(r.counts(0) == 3L) // degenerate range: everything in bucket 0
  }

  test("Bucketize: half-open buckets, closed last bucket, -1 out of range") {
    val df = Seq(0.0, 9.99, 10.0, 19.99, 20.0, -1.0, 25.0).toDF("v")
    val got = df.select(col("v"),
      Bucketize(col("v"), Seq(0.0, 10.0, 20.0)).as("b")).collect()
      .map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(got(0.0) == 0 && got(9.99) == 0)
    assert(got(10.0) == 1 && got(19.99) == 1)
    assert(got(20.0) == 1) // last bucket closed (hi += 1e-9)
    assert(got(-1.0) == -1 && got(25.0) == -1)
  }

  test("approx_count_distinct within 5% of exact on lineitem partkeys") {
    val li = graft.queries.Tables.lineitem(spark, SparkFixture.sf0001)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"))).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("histogram asDf covers all buckets including empty ones") {
    val df = Seq(0.0, 100.0).toDF("v")
    val h = DfHistogram.asDf(df, "v", numBins = 4)
    assert(h.count() == 4)
    val n = h.orderBy("bucket").select("n").as[Long].collect()
    assert(n.toSeq == Seq(1L, 0L, 0L, 1L))
  }

  test("RangeJoin equals the naive range join and stays an equi-join plan") {
    val ev = graft.queries.Tables.events(spark, SparkFixture.sf0001)
    val sixH = 6L * 3600 * 1000000
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_ts"), col("event_id").as("e_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val got = RangeJoin(errors, purchases, Seq("user_id"),
      ("e_ts", "p_ts"), -sixH, sixH)
    val naive = errors.join(purchases,
      errors("user_id") === purchases("user_id") &&
        unix_micros(col("p_ts")).between(
          unix_micros(col("e_ts")) - sixH, unix_micros(col("e_ts")) + sixH))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("e_id"), col("p_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = pairs(got)
    assert(gotPairs == pairs(naive))
    assert(gotPairs.nonEmpty)
    // the whole point: the bucketed form must be an equi-join
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    // asymmetric window exercises the two-bucket probe path
    val asym = RangeJoin(errors, purchases, Seq("user_id"),
      ("e_ts", "p_ts"), 0L, 2 * sixH)
    val asymNaive = errors.join(purchases,
      errors("user_id") === purchases("user_id") &&
        unix_micros(col("p_ts")).between(
          unix_micros(col("e_ts")), unix_micros(col("e_ts")) + 2 * sixH))
    assert(pairs(asym) == pairs(asymNaive))
  }

  test("TokenPacker: contiguous global layout, boundary-spanning docs, zero-token docs") {
    val docs = Seq(
      (1L, 100L), (2L, 500L), (3L, 0L), (4L, 12L), (5L, 2000L), (6L, 1L))
      .toDF("doc_id", "n_tokens")
      .repartition(4) // force the multi-partition prefix-sum path
    val out = TokenPacker(docs, "n_tokens", 512, Seq(col("doc_id")))
      .orderBy("doc_id")
      .select("doc_id", "start_token", "pack_first", "pack_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // hand-computed: cum = 100, 600, 600, 612, 2612, 2613
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L),       // [0, 100)   in pack 0
      (2L, 100L, 0L, 1L),     // [100, 600) spans packs 0-1
      (3L, 600L, 1L, 1L),     // zero tokens at offset 600
      (4L, 600L, 1L, 1L),     // [600, 612)
      (5L, 612L, 1L, 5L),     // [612, 2612) spans packs 1-5
      (6L, 2612L, 5L, 5L)))   // [2612, 2613)
    // global invariant: stream is gapless
    val cums = out.map(_._2)
    assert(cums.toSeq == cums.sorted.toSeq)
  }

  test("SnapshotMerge: upsert semantics, idempotent replay, no-op edge cases") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "b2", 25.0, "U"),  // update existing
      (3L, "c", 30.0, "D"),   // delete existing
      (4L, "d", 40.0, "I"),   // insert new
      (9L, "x", 0.0, "D"),    // delete of ABSENT key: must be a no-op
      (1L, "a1", 11.0, "I"))  // insert of EXISTING key: acts as update
      .toDF("k", "name", "v", "op")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
    val merged = SnapshotMerge(base, changes, "k")
    assert(rows(merged) == Set(
      (1L, "a1", 11.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
    // Idempotent replay: applying the same change set to the merged
    // snapshot yields the same snapshot (I-on-existing behaves as U,
    // D-on-absent stays a no-op).
    assert(rows(SnapshotMerge(merged, changes, "k")) == rows(merged))
    // Malformed CDC rows (null / unknown op) are dropped, never leaked
    // as phantom all-NULL snapshot rows.
    val malformed = Seq((99L, "z", 1.0, null.asInstanceOf[String]),
      (98L, "y", 2.0, "X")).toDF("k", "name", "v", "op")
    assert(rows(SnapshotMerge(base, malformed, "k")) == rows(base))
    // Contract guards
    intercept[IllegalArgumentException] {
      SnapshotMerge(base, changes.drop("name"), "k")
    }
  }

  test("SnapshotMerge.applyAtRest: crash between the swap renames is repaired") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_snaprec_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "snap").getAbsolutePath
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .coalesce(1).write.parquet(path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val src = new Path(path)
    val bak = new Path(src.getParent, s".${src.getName}__snap_old")
    val tmp = new Path(src.getParent, s".${src.getName}__snap_tmp")
    // SIMULATE "crashed after rename(src, bak), before rename(tmp, src)":
    // no snapshot at path, backup holds the pre-merge state, stale tmp.
    require(fs.rename(src, bak))
    fs.mkdirs(tmp)
    // next apply (the foreachBatch replay) must roll back and succeed
    val changes = Seq((2L, 25.0, "U"), (3L, 30.0, "I")).toDF("k", "v", "op")
    SnapshotMerge.applyAtRest(spark, path, changes, "k")
    val got = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (2L, 25.0), (3L, 30.0)))
    assert(!fs.exists(bak) && !fs.exists(tmp), "no swap debris survives")
    // a stale backup NEXT TO a live snapshot (crash after the second
    // rename) is swept on entry, and the merge still applies cleanly
    fs.mkdirs(bak)
    SnapshotMerge.applyAtRest(spark, path,
      Seq((3L, 0.0, "D")).toDF("k", "v", "op"), "k")
    val got2 = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got2 == Set((1L, 10.0), (2L, 25.0)))
    assert(!fs.exists(bak))
    // nothing at path and nothing to recover: loud failure, not a write
    val none = new java.io.File(dir, "never").getAbsolutePath
    intercept[IllegalArgumentException] {
      SnapshotMerge.applyAtRest(spark, none, changes, "k")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("CSV lane keeps NULL and empty string distinguishable (pinned nullValue)") {
    // The srcCsvRoundtrip option set: nullValue "\N" on write AND read,
    // emptyValue "" on read. Without the sentinel, the writer renders
    // NULL as "" and the reader resurrects it as "" — silent NULL→""
    // loss on any corpus with null text.
    val dir = java.nio.file.Files.createTempDirectory("graft_csvnull_").toFile
    try {
      val in = Seq(
        (1L, "hello,\nworld"), (2L, null), (3L, ""), (4L, "plain"),
        (5L, "\\N"))
        .toDF("doc_id", "text")
      in.coalesce(1).write.mode("overwrite").option("header", "true")
        .option("nullValue", "\\N").csv(dir.getAbsolutePath)
      val back = spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("emptyValue", "").option("nullValue", "\\N")
        .schema("doc_id BIGINT, text STRING")
        .csv(dir.getAbsolutePath)
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
        .toMap
      assert(back(1L) == "hello,\nworld") // quoted multiline survives
      assert(back(2L) == null)            // NULL stays NULL
      assert(back(3L) == "")              // "" stays "", not NULL
      assert(back(4L) == "plain")
      // The DOCUMENTED residual: text that IS the sentinel collides
      // with NULL (the writer doesn't quote it). Pinned so a future
      // option change that alters this behavior is noticed.
      assert(back(5L) == null)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
