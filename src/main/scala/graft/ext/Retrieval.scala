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
    * Scale shape: ONE tokenize pass. A fused compiled kernel maps each
    * doc to (doc_length, per-query-term tf vector) — O(|terms|) doubles
    * per row, 10-100× smaller than the text it derives from — and that
    * frame is localCheckpoint'd (the persist-before-multi-action
    * convention, cf. tCurriculum) so the tokenize kernel never re-runs.
    * Then ONE fused stats aggregate (corpus row count, token-length
    * sum, and per-term document frequency as sum(tf_j > 0) — a single
    * job, O(|terms|) driver state, the IVF-centroid convention), then a
    * scoring projection over the checkpointed frame (fixed-order
    * arithmetic column) and a TakeOrderedAndProject for the top-k. No
    * shuffle of the documents at all.
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
    // Fused kernel: tokenize ONCE per doc → (dl, tf vector). Null text →
    // null struct (null dl/score, matching size(null)/sum-skip SQL
    // semantics). Compiled loop, no interpreted HOF (the Dedup rule).
    val termArr = terms.toArray
    val dlTfsU = udf((text: String) => {
      if (text == null) null.asInstanceOf[(Double, Array[Double])]
      else {
        val toks = TextFunctions.tokenizeFn(text)
        val out = new Array[Double](termArr.length)
        val it = toks.iterator
        while (it.hasNext) {
          val tok = it.next()
          var j = 0
          while (j < termArr.length) {
            if (termArr(j) == tok) out(j) += 1.0
            j += 1
          }
        }
        (toks.length.toDouble, out)
      }
    })
    // Checkpointed rows are (id, double, |terms| doubles) — bounded per
    // row and tiny vs the source text, safe to materialize at any SF.
    val prepped = docs
      .select(col(idCol).as("doc_id"), dlTfsU(col(textCol)).as("__p"))
      .select(col("doc_id"), col("__p").getField("_1").as("__dl"),
        col("__p").getField("_2").as("__tfs"))
      .localCheckpoint()

    // ONE fused stats job: N, Σdl, and df per term (docs with tf > 0).
    val aggCols =
      Seq(count(lit(1)).cast("double").as("n"), sum(col("__dl")).as("sdl")) ++
      termArr.indices.map(j => sum(
        when(col("__tfs").getItem(j) > 0.0, 1.0).otherwise(0.0)).as(s"df_$j"))
    val statsRow = prepped.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val n = statsRow.getDouble(0)
    if (n == 0) // empty corpus: deliberate empty result, same schema
      return prepped.select(col("doc_id"), lit(0.0).as("bm25")).limit(0)
    val avgdl = statsRow.getDouble(1) / n

    val contribs = terms.zipWithIndex.map { case (t, j) =>
      val dfT = statsRow.getDouble(2 + j)
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tfc = col("__tfs").getItem(j)
      lit(idf) * (tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / lit(avgdl))))
    }
    val score = contribs.reduceLeft(_ + _)
    prepped.select(col("doc_id"),
        graft.functions.DetRound.det6(score).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** CCNet-style unigram surprisal: mean −ln p(token) per document
    * under a BOUNDED corpus unigram model — the classic LM-perplexity
    * quality filter (high surprisal ≈ gibberish / OOD text, low ≈
    * boilerplate).
    *
    * Scale shape: one map-side-combined wordcount produces the
    * distributed frequency table; the model the driver holds is HARD
    * CAPPED at the top-`maxVocab` tokens by count (ties broken by token
    * asc — deterministic at the boundary), fetched via a single
    * TakeOrdered job, so driver state is O(maxVocab) — the actual CCNet
    * practice (a fixed ~top-200k vocabulary; the heavy-tailed remainder
    * is out-of-vocabulary and scores as count 0, i.e. skipped). The
    * normalizer `total` is the FULL corpus token count (one 1-row
    * aggregate over the same cached frequency table), so in-vocab
    * probabilities are unchanged by the cap. The model then ships as one
    * broadcast and scoring is a single map-only scan. On any corpus
    * whose vocabulary fits the cap (every test fixture) the result is
    * bit-identical to the unbounded model.
    *
    * Determinism: each doc folds its per-distinct-token contributions
    * (count × ln(freq/total)) in SORTED token order — a pinned IEEE
    * fold any engine reproduces; 6dp rounding in-kernel. */
  def surprisal(
      docs: DataFrame, idCol: String, textCol: String,
      maxVocab: Int = 200000): DataFrame = {
    val freqDf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (freqs, total) = try {
      val totRow = freqDf.agg(sum(col("n"))).collect()(0)
      val tot = if (totRow.isNullAt(0)) 0.0 else totRow.getLong(0).toDouble
      // TakeOrdered: O(maxVocab) driver state however large the corpus.
      val top = freqDf.orderBy(col("n").desc, col("__tok"))
        .limit(maxVocab)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (top, tot)
    } finally freqDf.unpersist(blocking = false)
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

  /** Bigram surprisal: mean −ln p(w_i | w_{i-1}) per document under a
    * BOUNDED corpus bigram model — the next rung of the CCNet-style
    * LM-quality-filter ladder after [[surprisal]] (real CCNet uses a
    * 5-gram KenLM; the bigram model is the largest n the engine can pin
    * with an exact cross-engine oracle).
    *
    * Model: p(w2|w1) = c(w1 w2) / c(w1), with BOTH tables hard-bounded
    * the [[surprisal]] way — unigrams capped at top-`maxVocab`, bigrams
    * at top-`maxBigrams`, each by (count desc, key asc) via one
    * TakeOrdered job over its persisted frequency table. A position
    * scores only if its bigram AND its prefix unigram are in-model
    * (OOV skipped — count-0 convention); the result divides by
    * (len − 1) positions. Driver state O(maxVocab + maxBigrams).
    *
    * Determinism: per-doc contributions (n_occurrences × ln(c2/c1))
    * fold in SORTED bigram order; 6dp floor-round in-kernel — the
    * surprisal conventions exactly. */
  def bigramSurprisal(
      docs: DataFrame, idCol: String, textCol: String,
      maxVocab: Int = 200000, maxBigrams: Int = 200000): DataFrame = {
    // BOTH model tables from ONE tokenize pass: a fused kernel emits
    // every unigram and bigram of a doc as tagged grams ("u:w" /
    // "b:w1 w2"), one map-side-combined count aggregates them, and the
    // gram-scale result is cached for its two TakeOrdered caps. Total
    // corpus scans for the operator: this one + the scoring scan — the
    // bm25/surprisal one-pass convention (the alternative, a separate
    // count job per n, pays the tokenize kernel once per model).
    val gramsU = udf((text: String) => {
      if (text == null) Seq.empty[String]
      else {
        val ts = TextFunctions.tokenizeFn(text)
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          out += "u:" + ts(i)
          if (i < ts.length - 1) out += "b:" + ts(i) + " " + ts(i + 1)
          i += 1
        }
        out.result()
      }
    })
    val gramDf = docs.select(explode(gramsU(col(textCol))).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (uni, bi) = try {
      def top(prefix: String, cap: Int): Map[String, Long] = gramDf
        .where(col("__g").startsWith(prefix))
        .orderBy(col("n").desc, col("__g")).limit(cap)
        .collect()
        .map(r => r.getString(0).substring(2) -> r.getLong(1)).toMap
      (top("u:", maxVocab), top("b:", maxBigrams))
    } finally gramDf.unpersist(blocking = false)
    val bUni = docs.sparkSession.sparkContext.broadcast(uni)
    val bBi = docs.sparkSession.sparkContext.broadcast(bi)
    val scoreU = udf((ts: Seq[String]) => {
      if (ts == null || ts.length < 2) 0.0
      else {
        val u = bUni.value; val b = bBi.value
        val counts = new java.util.TreeMap[String, Int]()
        var i = 0
        while (i < ts.length - 1) {
          counts.merge(ts(i) + " " + ts(i + 1), 1, Integer.sum)
          i += 1
        }
        var s = 0.0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val w1 = e.getKey.substring(0, e.getKey.indexOf(' '))
          (b.get(e.getKey), u.get(w1)) match {
            case (Some(c2), Some(c1)) =>
              s += e.getValue * math.log(c2.toDouble / c1.toDouble)
            case _ => // OOV position: skipped (count 0 under the model)
          }
        }
        val raw = -s / (ts.length - 1)
        math.floor(raw * 1e6 + 0.5) / 1e6
      }
    })
    docs.select(col(idCol).as("doc_id"),
      scoreU(TextFunctions.tokens(col(textCol))).as("surprisal2"))
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
