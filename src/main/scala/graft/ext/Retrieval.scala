package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus retrieval + train/test contamination — the two query shapes a
  * training-data pipeline runs against its document store beyond dedup:
  * "which documents match these terms" (BM25 keyword retrieval, the
  * classic data-curation filter) and "which training documents leak the
  * benchmark" (n-gram overlap contamination detection, the
  * GPT-3/PaLM-style decontamination pass).
  *
  * Both are engine-native DataFrame plans (no driver-side loops over
  * data): BM25 is one corpus-stats aggregate + a codegen'd scoring
  * projection + TakeOrdered; contamination is a shingle-bucket
  * equi-join with the benchmark side broadcast — never an all-pairs
  * product.
  *
  * Reference behavior anchor: the reference ships only exact-text
  * search helpers; both operators here are engine-added capabilities
  * (SURVEY §2 extension surface), value-oracled by the driver.
  */
object Retrieval {

  /** Okapi BM25 top-k over a document table.
    *
    * Scoring: for query terms T, score(d) = Σ_{t∈T} idf(t) ·
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), idf(t) =
    * ln((N − df + 0.5)/(df + 0.5) + 1) — the standard
    * Robertson/Sparck-Jones form, non-negative.
    *
    * Scale shape: two bounded aggregates up front (corpus row count +
    * token-length sum; per-term document frequency — both one job,
    * O(|terms|) driver state, the IVF-centroid convention), then a
    * single scan computing the score as a fixed-order arithmetic column
    * (per-term tf via a compiled UDF — not an interpreted array HOF)
    * and a TakeOrderedAndProject for the top-k. No shuffle of the
    * documents at all.
    *
    * Determinism: tf/df/N/dl are exact integers; dl sums are exact in
    * double (< 2^53); contributions are added left-to-right in `terms`
    * order; the score is rounded to 6dp before the (score desc, id)
    * ranking — replicable bit-for-bit by the DuckDB oracle, which
    * mirrors the same expression tree.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__dl", size(col("__t")).cast("double"))

    // Corpus stats: one aggregate job, two scalars of driver state.
    val statsRow = toks.agg(
      count(lit(1)).cast("double").as("n"), sum(col("__dl")).as("sdl"))
      .collect()(0)
    val n = statsRow.getDouble(0)
    if (n == 0) // empty corpus: deliberate empty result, same schema
      return toks.select(col("doc_id"), lit(0.0).as("bm25")).limit(0)
    val avgdl = statsRow.getDouble(1) / n

    // Per-term document frequency: distinct-token explode filtered to
    // the |terms| query terms — map-side combine, O(|terms|) rows out.
    val dfMap = toks
      .select(explode(array_distinct(col("__t"))).as("__tok"))
      .where(col("__tok").isin(terms: _*))
      .groupBy(col("__tok")).agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // All term frequencies in ONE compiled UDF call (one token-array
    // conversion per row, not per term; no interpreted HOF in the hot
    // path — the Dedup.scala rule).
    val termArr = terms.toArray
    val tfsU = udf((toks: Seq[String]) => {
      val out = new Array[Double](termArr.length)
      if (toks != null) {
        val it = toks.iterator
        while (it.hasNext) {
          val tok = it.next()
          var j = 0
          while (j < termArr.length) {
            if (termArr(j) == tok) out(j) += 1.0
            j += 1
          }
        }
      }
      out
    })
    val withTfs = toks.withColumn("__tfs", tfsU(col("__t")))

    val contribs = terms.zipWithIndex.map { case (t, j) =>
      val dfT = dfMap.getOrElse(t, 0.0)
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tfc = col("__tfs").getItem(j)
      lit(idf) * (tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / lit(avgdl))))
    }
    val score = contribs.reduceLeft(_ + _)
    withTfs.select(col("doc_id"),
        graft.functions.DetRound.det6(score).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** CCNet-style unigram surprisal: mean −ln p(token) per document
    * under the corpus unigram model — the classic LM-perplexity quality
    * filter (high surprisal ≈ gibberish / OOD text, low ≈ boilerplate).
    *
    * Scale shape: one map-side-combined wordcount (the unigram model;
    * driver state O(vocab) — the bounded-vocabulary convention of
    * CCNet-style filters, broadcast to executors), then a single
    * scoring scan. Determinism: each doc folds its per-distinct-token
    * contributions (count × ln(freq/total)) in SORTED token order — a
    * pinned IEEE fold any engine reproduces; 6dp rounding in-kernel.
    * Out-of-vocabulary tokens are skipped (count 0 under the model). */
  def surprisal(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val freqs: Map[String, Long] = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = freqs.values.sum.toDouble
    // The model ships as a real broadcast (one copy per executor), not
    // a task-closure capture re-serialized per task.
    val bFreqs = docs.sparkSession.sparkContext.broadcast(freqs)
    val scoreU = udf((toks: Seq[String]) => {
      val freqs = bFreqs.value
      if (toks == null || toks.isEmpty) 0.0
      else {
        val counts = new java.util.TreeMap[String, Int]()
        toks.foreach(t => counts.merge(t, 1, Integer.sum))
        var s = 0.0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          freqs.get(e.getKey).foreach { f =>
            s += e.getValue * math.log(f.toDouble / total)
          }
        }
        val raw = -s / toks.length
        math.floor(raw * 1e6 + 0.5) / 1e6
      }
    })
    docs.select(col(idCol).as("doc_id"),
      scoreU(TextFunctions.tokens(col(textCol))).as("surprisal"))
  }

  /** Benchmark-contamination pairs: (benchmark doc, corpus doc) sharing
    * at least `minShared` distinct word `n`-grams.
    *
    * Scale shape: the two sides filter `docs` disjointly, so each
    * side's shingle kernel runs exactly once streaming into the join —
    * no corpus-sized materialization anywhere. The benchmark side
    * (eval sets are small by construction) is broadcast, so the corpus
    * never shuffles: at 100 TB this is a map-only scan of the corpus
    * against a broadcast shingle set, aggregating only the matching
    * (bench, corpus) pairs. (Locally, a corpus arriving in fewer
    * splits than cores is widened first — the BalancedSample
    * fewer-splits rule; a well-split scan skips that exchange.)
    */
  def contaminationPairs(
      docs: DataFrame, idCol: String, textCol: String,
      benchFlag: Column, n: Int = 8, minShared: Int = 1): DataFrame = {
    val s = docs.sparkSession
    // The two sides partition `docs` disjointly, so each side's shingle
    // kernel runs exactly once with NO materialization barrier — never
    // cache/checkpoint the corpus-sized shingle set (that is the
    // self-join double-compute rule, which does not apply here).
    def shingled(side: DataFrame, outId: String): DataFrame =
      side.select(col(idCol).as(outId),
        explode(TextFunctions.shinglesOfText(col(textCol), n)).as("__s"))
    val bench = shingled(docs.where(benchFlag), "bench_id")
    // Widen ONLY under-split inputs (local single-file scans): a
    // well-partitioned corpus must stay a map-only scan, no exchange.
    val p = s.sparkContext.defaultParallelism
    val corpusSide = docs.where(!benchFlag)
    val corpus = shingled(
      if (corpusSide.rdd.getNumPartitions < p) corpusSide.repartition(p)
      else corpusSide,
      "corpus_id")
    corpus.join(broadcast(bench), "__s")
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).cast("int").as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
