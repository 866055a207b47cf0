package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Retrieval, Redaction, SimilaritySearch}
import graft.operators.ColumnProfiler

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------------------ BM25

  test("bm25TopK matches the hand-computed Okapi formula") {
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark is a query engine"),
      (3L, "ducks swim on the pond")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("spark"), k = 3).collect()
    // N=3, df=2, idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    val avgdl = (5.0 + 5.0 + 5.0) / 3.0
    def score(tf: Double, dl: Double): Double = {
      val raw = idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl)))
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    val byId = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) == score(3.0, 5.0))
    assert(byId(2L) == score(1.0, 5.0))
    assert(byId(3L) == 0.0)
    // tf saturation: 3 mentions score higher, but < 3x the single mention
    assert(byId(1L) > byId(2L) && byId(1L) < 3 * byId(2L))
  }

  test("bm25TopK ranks multi-term matches and bounds k") {
    val docs = (1L to 30L).map { i =>
      val text = if (i <= 3) "alpha beta gamma" else "delta epsilon zeta"
      (i, text)
    }.toDF("doc_id", "text")
    val q = Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("alpha", "beta"), k = 5)
    // top-k must plan as TakeOrderedAndProject — never a global sort
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val out = q.collect()
    assert(out.length == 5)
    // the 3 matching docs outrank the rest; ties break by doc_id
    assert(out.take(3).map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(3).getDouble(1) == 0.0)
  }

  // --------------------------------------------------------- contamination

  test("contaminationPairs finds planted n-gram overlap, broadcast plan") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared unique trailer one", true),
      (2L, s"prefix words here $shared", false), // contaminated
      (3L, "completely different content with many other words", false))
      .toDF("doc_id", "text", "is_bench")
    val out = Retrieval.contaminationPairs(docs, "doc_id", "text",
      benchFlag = col("is_bench"), n = 8)
    val rows = out.collect()
    // doc2 shares 3 distinct 8-gram shingles of the 10 shared tokens
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 2L)
    assert(rows(0).getInt(2) == 3)
    // the bench side must broadcast — corpus never shuffles
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("contaminationPairs leaves a well-split corpus unshuffled") {
    val p = spark.sparkContext.defaultParallelism
    val docs = (1L to 200L).map(i =>
      (i, (1 to 10).map(j => s"t${i % 7}$j").mkString(" "), i <= 5))
      .toDF("doc_id", "text", "is_bench")
      // more splits than cores: no widening needed. checkpoint so the
      // fixture's own repartition is not in the plan under test
      .repartition(p * 2).localCheckpoint()
    val out = graft.ext.Retrieval.contaminationPairs(
      docs, "doc_id", "text", col("is_bench"), n = 8)
    val plan = out.queryExecution.executedPlan.toString
    // the corpus side must stream map-only into the broadcast join —
    // the only exchange is the final (bench, corpus) aggregation
    assert(!plan.contains("RoundRobinPartitioning"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("contaminationPairs respects minShared") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared, true),
      (2L, s"$shared extra", false)).toDF("doc_id", "text", "is_bench")
    val one = Retrieval.contaminationPairs(docs, "doc_id", "text",
      col("is_bench"), n = 8, minShared = 1).count()
    val five = Retrieval.contaminationPairs(docs, "doc_id", "text",
      col("is_bench"), n = 8, minShared = 5).count()
    assert(one == 1 && five == 0)
  }

  // ------------------------------------------------------------- redaction

  test("redact masks emails then phones; counts match") {
    val df = Seq(
      (1L, "write to jane.doe+spam@mail.example.org or call +1-555-0199"),
      (2L, "no pii here"),
      (3L, "two mails: a@b.io c.d@e-f.co and +44-123-4567")).toDF("id", "t")
    val out = df.select(col("id"),
      Redaction.emailCount(col("t")).as("e"),
      Redaction.phoneCount(col("t")).as("p"),
      Redaction.redact(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getString(3))).toMap
    assert(out(1L) == ((1, 1,
      "write to [EMAIL] or call [PHONE]")))
    assert(out(2L) == ((0, 0, "no pii here")))
    assert(out(3L) == ((2, 1, "two mails: [EMAIL] [EMAIL] and [PHONE]")))
  }

  // ------------------------------------------------------------- surprisal

  test("surprisal: rare-token docs score higher; uniform doc is baseline") {
    val docs = (Seq.fill(20)("the common words here") :+ "zyzzyva qwerty")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Retrieval.surprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the doc of two rare tokens is far more surprising than the
    // repeated boilerplate
    assert(out(20L) > out(0L) + 1.0)
    // identical docs score identically
    assert(out(0L) == out(19L))
    assert(out.values.forall(_ >= 0.0))
  }

  // ------------------------------------------------------------ repetition

  test("repetition signals: duplicated trigrams and top bigram fraction") {
    import graft.ext.{TextFunctions => TF}
    val df = Seq(
      (1L, "spam spam spam spam spam"),    // all grams identical
      (2L, "one two three four five six"), // all grams unique
      (3L, "ab"),                          // too short for any gram
      (4L, "go go stop go go stop"))
      .toDF("id", "t")
    val out = df.select(col("id"),
      TF.dupTrigramFrac(col("t")).as("d3"),
      TF.topBigramFrac(col("t")).as("b2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out(1L) == ((1.0, 1.0)))
    assert(out(2L) == ((0.0, 0.2)))  // unique trigrams; each of 5 bigrams once
    assert(out(3L) == ((0.0, 0.0)))
    // doc 4 trigrams: [go go stop]x2, [go stop go], [stop go go] -> 2/4;
    // bigrams: [go go]x2, [go stop]x2, [stop go]x1 -> top 2/5
    assert(out(4L) == ((0.5, 0.4)))
  }

  // -------------------------------------------------------------- profiler

  test("ColumnProfiler: counts, distinct, typed min/max lanes") {
    val df = Seq(
      (1L, Some(2.5), "b"),
      (2L, None, "a"),
      (3L, Some(7.5), "c"),
      (3L, Some(2.5), "a")).toDF("k", "v", "s")
    val prof = ColumnProfiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = prof("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 4 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 3.0)
    val v = prof("v")
    assert(v.getLong(2) == 3 && v.getLong(3) == 2) // nulls excluded
    assert(v.getDouble(4) == 2.5 && v.getDouble(5) == 7.5)
    val s = prof("s")
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("ColumnProfiler approx mode plans without Expand") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val exact = ColumnProfiler.profile(df)
    // approx mode must not Expand; its counts stay sane on tiny input
    val approx = ColumnProfiler.profile(df, exactDistinct = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("k") == 2 && approx("s") == 2)
    assert(exact.count() == 2)
  }

  test("ColumnProfiler never plans the multi-distinct Expand; binary ok") {
    val df = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](1, 2)),
      (3L, Array[Byte](3))).toDF("k", "b")
    // capture plans of the two profile jobs via a listener-free check:
    // both component frames must be Expand-free
    val meltPlan = df.select(explode(array(
        struct(lit("k").cast("string"), col("k").cast("string")),
        struct(lit("b").cast("string"), hex(col("b"))))))
      .queryExecution.executedPlan.toString
    assert(!meltPlan.contains("Expand"))
    val prof = ColumnProfiler.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prof("b") == 2 && prof("k") == 3)
  }

  test("ColumnProfiler handles array/struct columns in the counts lane") {
    val df = Seq(
      (1L, Seq(1, 2), ("a", 1)),
      (2L, Seq(1, 2), ("a", 1)),
      (3L, Seq(3), ("b", 2))).toDF("k", "arr", "st")
    val prof = ColumnProfiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val arr = prof("arr")
    assert(arr.getLong(2) == 3 && arr.getLong(3) == 2) // distinct by value
    assert(arr.isNullAt(4) && arr.isNullAt(6)) // no min/max lane
    assert(prof("st").getLong(3) == 2)
  }

  test("quantizedTopK tolerates null and empty vectors") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, Seq(1.0f, 0.0f)),
      org.apache.spark.sql.Row(1L, Seq(1.0f, 1.0f)),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, Seq.empty[Float]))
    val vecs = spark.createDataFrame(rows, schema)
    val out = SimilaritySearch.quantizedTopK(
      vecs, vecs.where(col("vec_id") === 0L), "vec_id", "embedding", k = 5)
      .collect()
    // null/empty candidates are dropped, not crashed on
    assert(out.map(_.getLong(1)).toSet == Set(1L))
  }

  // ---------------------------------------------------------- quantization

  test("quantizedTopK: exact integer cosine on constructed vectors") {
    // scale = 4.0; q(v) = round(v/4*127)
    val vecs = Seq(
      (0L, Seq(4.0f, 0.0f)),  // q = (127, 0)
      (1L, Seq(4.0f, 4.0f)),  // q = (127, 127)
      (2L, Seq(0.0f, 4.0f)),  // q = (0, 127)
      (3L, Seq(-4.0f, 0.0f))) // q = (-127, 0)
      .toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 0L)
    val out = SimilaritySearch.quantizedTopK(vecs, q, "vec_id", "embedding",
      k = 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    def d6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1L) == d6(127.0 * 127 /
      (math.sqrt(127.0 * 127) * math.sqrt(2.0 * 127 * 127))))
    assert(out(2L) == 0.0)
    assert(out(3L) == d6(-1.0))
  }

  test("ivfQuantizedTopK: exhaustive probe equals quantized brute force") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 80L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exhaustive = rows(SimilaritySearch.ivfQuantizedTopK(
      vecs, queries, "vec_id", "embedding", k = 10,
      nCentroids = 4, nProbe = 4, iters = 2))
    val brute = rows(SimilaritySearch.quantizedTopK(
      vecs, queries, "vec_id", "embedding", k = 10))
    assert(exhaustive == brute)
    // selective probing: recall degrades gracefully, never exceeds cost
    val selective = SimilaritySearch.ivfQuantizedTopK(
      vecs, queries, "vec_id", "embedding", k = 10,
      nCentroids = 4, nProbe = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds & selective).size.toDouble / bruteIds.size
    assert(recall >= 0.5, s"2/4-probe recall $recall implausibly low")
  }

  test("quantizedTopK ranking tracks exact cosine on smooth vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map { i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") < 5)
    val exact = SimilaritySearch.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = SimilaritySearch.quantizedTopK(
      vecs, queries, "vec_id", "embedding", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization keeps top-10 recall high on gaussian vectors
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall < 0.8")
  }
}
