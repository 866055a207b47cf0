package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{TextFunctions => TF, Bpe, Dedup, SimilaritySearch,
  Retrieval, Redaction, Mixture}

/** Training-pipeline extension queries over `documents` / `embeddings`:
  * text analysis, dedup (exact / jaccard / minhash-LSH / simhash /
  * embedding-cosine), similarity search. SQL-expressible entries carry a
  * DuckDB oracle; LSH/simhash internals are engine-specific, so their
  * correctness is either (a) an exact-verify output that shares the
  * exact operator's oracle (minhash — no false positives by
  * construction, false negatives < 1e-10 at these band params against
  * this data's similarity gap), or (b) a rows-only driver check plus a
  * recall ScalaTest (simhash, LSH top-k).
  */
object Ext {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------ text

  val tTokenStats: Q = (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      TF.tokenCount(col("text")).as("n_tokens"),
      size(TF.distinctTokens(col("text"))).as("n_distinct_tokens"),
      TF.bpeishTokenCount(col("text")).as("n_bpeish_tokens"),
      TF.fingerprint(col("text")).as("fingerprint"))

  val tLangId: Q = (s, d) =>
    documents(s, d).select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))

  // Concat-and-chunk sequence packing into 512-token blocks, doc_id
  // order — the LLM pre-training layout. The prefix sum is the
  // distributed GlobalRank.withRunningSum (never an unpartitioned
  // window); the oracle is DuckDB's window cumsum.
  val tSeqPack: Q = (s, d) => {
    val withTokens = documents(s, d).select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.TokenPacker(withTokens, "n_tokens", 512, Seq(col("doc_id")))
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("pack_first"), col("pack_last"))
  }

  // BPE subword token stats: the production packing-budget quantity
  // (t_seq_pack's word count is the proxy). Counts AND the first
  // word's actual token boundaries are value-checked — the oracle
  // replays the pinned merge table with a recursive replace-to-fixpoint
  // over the distinct vocabulary (see Bpe scaladoc for why the two
  // scan orders provably agree).
  val tBpeTokens: Q = (s, d) =>
    documents(s, d).select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("n_words"),
      Bpe.bpeTokenCount(col("text")).as("n_bpe_tokens"),
      Bpe.bpeHeadEncoding(col("text")).as("head_enc"))

  // BPE merge TRAINING on the corpus (the learn-side of the BPE story;
  // no SQL oracle — iterative data-dependent training isn't
  // SQL-expressible, so the driver records the weaker rows-only check.
  // The heavy lifting is spec'd instead: BpeSpec proves the distributed
  // trainer equals an independent sequential reference on this same
  // corpus, is deterministic, confluent, and compresses.) Output: the
  // learned rules in priority order.
  val tBpeTrain: Q = (s, d) => {
    import s.implicits._
    Bpe.trainMerges(documents(s, d), "text", numMerges = 50)
      .zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "left", "right")
  }

  // TokenPacker driven by the BPE counts — the packing layout a real
  // training run would use. Same concat-and-chunk contract as
  // t_seq_pack, different (subword) budget quantity.
  val tSeqPackBpe: Q = (s, d) => {
    val withTokens = documents(s, d).select(col("doc_id"),
      Bpe.bpeTokenCount(col("text")).as("n_tokens"))
    graft.operators.TokenPacker(withTokens, "n_tokens", 512, Seq(col("doc_id")))
      .select(col("doc_id"), col("n_tokens"), col("start_token"),
        col("pack_first"), col("pack_last"))
  }

  // Rolling-hash document fingerprints (winnowing / MOSS). Compact
  // whole-set value check: per doc, the fingerprint COUNT and the XOR
  // of all fingerprints (order-free, overflow-free) — any hash, window
  // or dedup slip flips the xor. Docs shorter than k chars have no
  // fingerprints and are excluded on both sides.
  val tWinnow: Q = (s, d) => {
    val fps = TF.winnowFingerprints(col("text"), k = 25, w = 16)
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), fps.as("fps"))
      .where(size(col("fps")) > 0)
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        udf((fps: Seq[Long]) => fps.foldLeft(0L)(_ ^ _))
          .apply(col("fps")).as("fp_xor"))
  }

  // Winnowing as a NEAR-DUP CANDIDATE generator: explode the per-doc
  // fingerprint sets and equi-join on the fingerprint value (the same
  // bucket-join shape as MinHash LSH — shuffle is O(docs × fps/doc),
  // never all-pairs), keeping pairs that share >= 3 fingerprints. By
  // the winnowing guarantee, any shared run >= w+k-1 chars surfaces
  // the pair; the shared-count threshold is the noise floor.
  val dedupWinnow: Q = (s, d) => {
    // localCheckpoint before the self-join (the jaccardPairs /
    // minhashLshPairs rule): both sides read the materialized rows
    // instead of running the winnowing kernel twice.
    val fps = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(TF.winnowFingerprints(col("text"), 25, 16)).as("fp"))
      .localCheckpoint()
    val l = fps.as("l"); val r = fps.as("r")
    l.join(r, col("l.fp") === col("r.fp") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).cast("int").as("n_shared"))
      .where(col("n_shared") >= 3)
  }

  // Deterministic 80/10/10 train/val/test split via the portable
  // md5-threshold draw (BalancedSample.hash60): any engine reproduces
  // the assignment, so shards are stable across runs/engines — the
  // property a training pipeline actually needs from a splitter.
  val tSplit: Q = (s, d) => {
    val draw = graft.operators.BalancedSample.hash60(Seq(col("doc_id")), 42L)
    val twoPow60 = math.pow(2.0, 60)
    documents(s, d).select(col("doc_id"),
      when(draw < lit(0.8 * twoPow60), "train")
        .when(draw < lit(0.9 * twoPow60), "val")
        .otherwise("test").as("split"))
  }

  // Deterministic global shuffle: position = rank in md5-hash order —
  // the reproducible "shuffle the corpus" primitive. Ranking is the
  // distributed GlobalRank (range partition + offsets), not a
  // single-reducer window.
  val tShuffleRank: Q = (s, d) => {
    val hashed = documents(s, d).select(col("doc_id"),
      md5(concat(col("doc_id").cast("string"), lit("shuf"))).as("__h"))
    graft.operators.GlobalRank.withRowNumber(
      hashed, "pos", Seq(col("__h"), col("doc_id")))
      .select(col("doc_id"), col("pos"))
  }

  // Vocabulary building: token counts with map-side combine, top 100 by
  // (count desc, token) — TakeOrderedAndProject, no global sort.
  val tVocab: Q = (s, d) =>
    documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(100)

  // Exact heavy hitters (tokens with > 2% corpus frequency) via the
  // two-pass Misra-Gries pattern: a bounded map-side sketch (capacity
  // 2t) narrows the corpus to ≤ 2t candidates, then one exact count
  // pass over the broadcast-semi-joined candidates — the shuffle never
  // carries the full vocabulary. Composite output is EXACT (the sketch
  // guarantees no item above threshold is lost), hence the plain SQL
  // oracle; the sketch's superset guarantee under genuine pruning
  // (capacity << vocabulary) is differential-tested in OperatorSpec.
  val tHeavyHitters: Q = (s, d) => {
    val toks = documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("token"))
    graft.operators.HeavyHitters(toks, "token", t = 50)
      .orderBy(col("n").desc, col("item"))
  }

  // Suppression/generalization k-anonymity over the quasi-identifier
  // (lang, source, size bucket): classes of ≥ k keep the full QI
  // (level 0); smaller classes generalize the size dimension away and
  // re-test at (lang, source) over the still-exposed docs (level 1);
  // classes small even generalized are fully suppressed (level 2).
  // Scale shape: class-count tables are bounded by the QI domain (≪
  // rows) and broadcast — document rows are never shuffled.
  val tKAnon: Q = (s, d) => {
    val k = 5
    val q = documents(s, d).select(col("doc_id"), col("lang"),
      col("source"), expr("n_chars div 100").as("size_b"))
    val c0 = q.groupBy("lang", "source", "size_b")
      .agg(count(lit(1)).as("n0"))
    val j0 = q.join(broadcast(c0), Seq("lang", "source", "size_b"))
    val c1 = j0.where(col("n0") < k).groupBy("lang", "source")
      .agg(count(lit(1)).as("n1"))
    j0.join(broadcast(c1), Seq("lang", "source"), "left")
      .select(col("doc_id"),
        when(col("n0") >= k, 0).when(col("n1") >= k, 1).otherwise(2)
          .as("level"),
        when(col("n0") >= k || col("n1") >= k, col("lang")).as("lang_out"),
        when(col("n0") >= k || col("n1") >= k, col("source"))
          .as("source_out"),
        when(col("n0") >= k, col("size_b")).as("size_out"))
  }

  val tQuality: Q = (s, d) =>
    documents(s, d).select(
      col("doc_id"),
      TF.nChars(col("text")).as("n_chars_m"),
      graft.functions.DetRound.det6(TF.punctRatio(col("text"))).as("punct_ratio"),
      graft.functions.DetRound.det6(TF.stopwordRatio(col("text"))).as("stopword_ratio"),
      graft.functions.DetRound.det6(TF.meanTokenLen(col("text"))).as("mean_token_len"),
      TF.qualityScore(col("text")).as("quality"))

  /** The BM25 query-term set (corpus-vocabulary words) shared by the
    * Spark query and the DuckDB oracle builder. */
  val Bm25Terms = Seq("spark", "query", "join", "vector", "hash")

  // Okapi BM25 top-20: keyword retrieval over the corpus — exact
  // integer tf/df/dl statistics, fixed-order scoring arithmetic, 6dp
  // rounding before the (score desc, id) ranking.
  val tBm25: Q = (s, d) =>
    Retrieval.bm25TopK(documents(s, d), "doc_id", "text", Bm25Terms, k = 20)

  // Benchmark decontamination: corpus docs sharing an 8-token shingle
  // with the (broadcast) benchmark slice `source = 'src0'`.
  val tContamination: Q = (s, d) =>
    Retrieval.contaminationPairs(documents(s, d), "doc_id", "text",
      benchFlag = col("source") === "src0", n = 8)

  // Repetition-quality signals (Gopher/RefinedWeb-style): duplicated
  // trigram occurrence fraction + top-bigram occurrence fraction —
  // row-local compiled kernels, 6dp parity rounding in-kernel.
  val tRepetition: Q = (s, d) =>
    documents(s, d).select(col("doc_id"),
      TF.dupTrigramFrac(col("text")).as("dup_trigram_frac"),
      TF.topBigramFrac(col("text")).as("top_bigram_frac"))

  // Gopher-style document FILTER BUNDLE (Rae et al. 2021 §A1.1 — the
  // word-level subset; the fixture has no line structure, so the
  // line-based rules have no signal here): word-count bounds [50, 1e5],
  // mean-word-length bounds [3, 10], stopword presence (≥ 1 distinct
  // marker — Gopher asks ≥ 2 of its 8-word English list; this engine's
  // marker list is per-language, so the calibrated equivalent on the
  // fixture corpus is 1), and the
  // RefinedWeb-flavored repetition caps (dup-trigram ≤ 0.2, top-bigram
  // ≤ 0.18). Emits the raw signals, the per-rule booleans, and the
  // conjunction (`keep`) — the exact shape a curation pipeline
  // writes back as filter columns. All signals are single-division
  // doubles over integer counts or 6dp-pinned kernels: every boolean
  // compares identically on any engine.
  val tGopherFilter: Q = (s, d) =>
    documents(s, d).select(col("doc_id"),
      TF.tokenCount(col("text")).as("n_words"),
      graft.functions.DetRound.det6(TF.meanTokenLen(col("text")))
        .as("mean_word_len"),
      TF.distinctStopwordCount(col("text")).as("n_stopwords"),
      TF.dupTrigramFrac(col("text")).as("dup_trigram_frac"),
      TF.topBigramFrac(col("text")).as("top_bigram_frac"))
      .withColumn("r_word_count", col("n_words").between(50, 100000))
      .withColumn("r_word_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("r_stopwords", col("n_stopwords") >= 1)
      .withColumn("r_repetition",
        col("dup_trigram_frac") <= 0.2 && col("top_bigram_frac") <= 0.18)
      .withColumn("keep", col("r_word_count") && col("r_word_len") &&
        col("r_stopwords") && col("r_repetition"))

  // THE END-TO-END CURATION PIPELINE as one query — the flagship
  // composition a user of this engine actually ships: Gopher-rules
  // filter → near-dedup keep-set → benchmark decontamination →
  // deterministic split → token packing, each stage an independently
  // oracled operator, the whole chain value-pinned (any drift in any
  // stage flips the hash). Scale shape: every stage is its
  // already-audited self (map-only kernels, bucketed LSH joins,
  // broadcast bench side, distributed prefix sum); the composition
  // adds only key-equi joins on doc_id.
  /** The pipeline's survivor stage (pre-packing) — exposed so PlanSpec
    * can gate the JOIN/FILTER plan shapes directly: TokenPacker's
    * GlobalRank checkpoints eagerly, so planning the full query would
    * only show the post-checkpoint scan. */
  private[graft] def pipelineSurvivors(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val keepG = tGopherFilter(s, d).where(col("keep")).select("doc_id")
    val keepD = Dedup.pipelineKeep(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id")
    val contam = Retrieval.contaminationPairs(docs, "doc_id", "text",
        benchFlag = col("source") === "src0", n = 8)
      .select(col("corpus_id").as("doc_id")).distinct()
    docs.where(col("source") =!= "src0") // bench never trains
      .join(keepG, "doc_id").join(keepD, "doc_id")
      .join(contam, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), TF.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
  }

  val tPipelineE2e: Q = (s, d) => {
    val surv = pipelineSurvivors(s, d)
    val packed = graft.operators.TokenPacker(
      surv, "n_tokens", 512, Seq(col("doc_id")))
    val draw = graft.operators.BalancedSample.hash60(Seq(col("doc_id")), 42L)
    val twoPow60 = math.pow(2.0, 60)
    packed.select(col("doc_id"), col("n_tokens"), col("start_token"),
      col("pack_first"),
      when(draw < lit(0.8 * twoPow60), "train")
        .when(draw < lit(0.9 * twoPow60), "val")
        .otherwise("test").as("split"))
  }

  // Overlapping character chunks (RAG/embedding indexing prep): each
  // doc → its 200-char windows with 40-char overlap; emitted as
  // (doc_id, idx, start, len, md5) so the whole chunk CONTENT is
  // value-pinned without shipping it twice.
  val tChunk: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), explode(TF.chunks(col("text"), 200, 40)).as("c"))
      .select(col("doc_id"),
        col("c._1").as("chunk_idx"),
        col("c._2").as("chunk_start"),
        length(col("c._3")).as("chunk_len"),
        md5(col("c._3")).as("chunk_md5"))

  // Bigram surprisal (the LM-quality ladder's next rung): mean
  // -ln p(w_i | w_{i-1}) under the hard-bounded corpus bigram model —
  // OOV positions skipped, sorted-order IEEE fold, 6dp in-kernel.
  val tSurprisal2: Q = (s, d) =>
    Retrieval.bigramSurprisal(documents(s, d), "doc_id", "text")

  // Per-source TF-IDF top terms — the "what characterizes each slice of
  // my corpus" query a curation pipeline runs per domain/source:
  // tf(source, term) × ln((N+1)/(df+1)) with df = #sources containing
  // the term, smooth idf, top 5 per source. Scale shape: wordcount and
  // df are map-side-combined aggregates (corpus-scale scan, vocab-scale
  // output); the ranking window runs over the AGGREGATED (source, term)
  // frame — vocab-sized, never the corpus — partitioned by source (for
  // web-scale vocabularies the surprisal top-V cap convention applies
  // upstream). ln-parity + 6dp pin per the bm25 precedent.
  val tTfidfTerms: Q = (s, d) => {
    val tok = documents(s, d).select(col("source"),
      explode(TF.tokens(col("text"))).as("term"))
    // ONE corpus-scale pass: tf has exactly one row per (source, term),
    // so per-term df = that frame's row count per term — derived from
    // the vocab-scale aggregate, never a second tokenize/explode scan.
    // Checkpoint it (vocab-sized): tf feeds both the df rollup and the
    // scoring join (the persist-before-multi-action convention).
    val tf = tok.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // #sources: one 1-row aggregate, one scalar of driver state. Over
    // DOCUMENTS (column-pruned scan), matching the oracle — a source
    // whose docs hold zero tokens still counts toward N.
    val ns = documents(s, d).agg(countDistinct(col("source")))
      .collect()(0).getLong(0).toDouble
    val scored = tf.join(dfT, "term")
      .withColumn("tfidf", graft.functions.DetRound.det6(
        col("tf") * log(lit(ns + 1.0) / (col("df") + lit(1.0)))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("source"), col("term"), col("tfidf"), col("rank"))
  }

  // CCNet-style unigram surprisal (LM-perplexity quality filter): mean
  // -ln p(token) under the corpus unigram model, folded in sorted token
  // order for engine-exact IEEE parity.
  val tSurprisal: Q = (s, d) =>
    Retrieval.surprisal(documents(s, d), "doc_id", "text")

  // Curriculum sampling: the quality-stratified deterministic sample a
  // training pipeline draws when it wants equal representation across
  // quality strata — qualityScore → fixed-edge Bucketize → BalancedSample
  // (portable md5-threshold draw). Three already-oracled operators
  // composed END-TO-END; the oracle replays the whole chain, so any
  // drift in any stage flips the hash.
  val tCurriculum: Q = (s, d) => {
    val scored = documents(s, d).select(col("doc_id"),
      TF.qualityScore(col("text")).as("q"))
    // BalancedSample runs two actions (per-bucket counts, then the
    // filter scan); checkpoint the derived 3-scalar-column frame so the
    // tokenize-heavy quality kernel runs ONCE — the standard
    // persist-before-multi-action shape (the cached rows are 10-100x
    // smaller than the text they derive from, and spill to disk).
    val bucketed = scored.withColumn("bucket",
      graft.operators.Bucketize(col("q"), Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)))
      .localCheckpoint()
    graft.operators.BalancedSample(bucketed, "bucket",
      nPerCategory = Some(40), idCols = Seq("doc_id"))
      .select(col("doc_id"), col("bucket"))
  }

  /** Deterministic PII synthesis over (doc_id, text) — the corpus
    * carries no real PII, so the redaction queries plant it identically
    * on both engines. Shared by the batch and streaming entries. */
  private[queries] def piiSynth: org.apache.spark.sql.Column = concat(
    col("text"), lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com"),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit(" or call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      .otherwise(lit("")))

  /** Redaction projection over a documents-shaped frame (batch or
    * stream — pure codegen'd regex, no state). */
  private[queries] def redactProjection(docs: DataFrame): DataFrame = {
    val pii = piiSynth
    docs.select(col("doc_id"),
      Redaction.emailCount(pii).as("n_emails"),
      Redaction.phoneCount(pii).as("n_phones"),
      md5(Redaction.redact(pii)).as("redacted_hash"))
  }

  // PII redaction: emails + phone numbers are synthesized onto each doc
  // deterministically (the corpus itself carries none), then detected
  // and masked; the oracle replays the same synthesis + regex pipeline,
  // so the md5 of the redacted text checks masking exactly.
  val tRedact: Q = (s, d) => redactProjection(documents(s, d))

  // ----------------------------------------------------------------- dedup

  val dedupExact: Q = (s, d) =>
    Dedup.exactGroups(documents(s, d), "doc_id", "text")

  val dedupJaccard: Q = (s, d) =>
    Dedup.jaccardPairs(documents(s, d), "doc_id", "text", threshold = 0.5)

  // The jaccardPairs SKEW LEVER exercised end-to-end: shingles with
  // document frequency > 3 (boilerplate stop-shingles — at scale the
  // Σdf² pair blowup) are dropped BEFORE pair formation; sizes (the
  // jaccard denominators) are post-cap. The oracle replays the same df
  // cap in SQL, so the capped path is value-checked, not spec-only.
  val dedupJaccardCapped: Q = (s, d) =>
    Dedup.jaccardPairs(documents(s, d), "doc_id", "text", threshold = 0.5,
      n = 3, maxShingleDf = Some(3))

  val dedupMinhash: Q = (s, d) =>
    Dedup.minhashLshPairs(documents(s, d), "doc_id", "text", threshold = 0.5)

  val dedupSimhash: Q = (s, d) =>
    Dedup.simhashPairs(documents(s, d), "doc_id", "text", maxHamming = 3)

  val dedupEmbedding: Q = (s, d) =>
    Dedup.embeddingNearDupPairs(embeddings(s, d), "vec_id", "embedding",
      threshold = 0.45)

  // SemDeDup-style SEMANTIC keep-set: embedding near-dup pairs →
  // connected components → one canonical (min-id) survivor per
  // semantic cluster — the embedding-space twin of the text
  // dedup_pipeline_keep. The oracle closes the exact cosine pair set
  // transitively with a recursive CTE and keeps the minimum member.
  val dedupSemanticKeep: Q = (s, d) => {
    val pairs = Dedup.embeddingNearDupPairs(
      embeddings(s, d), "vec_id", "embedding", threshold = 0.45)
      .select(col("id_a"), col("id_b"))
    Dedup.nearDedupClusters(embeddings(s, d), "vec_id", pairs)
      .where(col("cluster_id") === col("id"))
      .select(col("id").as("vec_id"))
  }

  // ------------------------------------------------------------ similarity

  private def queriesSubset(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).where(col("vec_id") < 20)

  val simTopK: Q = (s, d) =>
    SimilaritySearch.bruteForceTopK(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", k = 10)

  // RADIUS (fixed-threshold) search — the top-k complement: all
  // candidates with cosine >= 0.4 per query. Shares sim_topk's scoring
  // arithmetic; the oracle drops the rank window for a threshold.
  val simRadius: Q = (s, d) =>
    SimilaritySearch.radiusSearch(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      minCosine = 0.4)

  // The IVF-BOUNDED radius lane in its EXHAUSTIVE configuration
  // (nProbe = nCentroids): the cell machinery runs for real but every
  // candidate is scored, so the result provably equals the brute lane
  // and shares sim_radius's oracle (the sim_ivf_topk pattern).
  // Selective-probe recall is measured in SimilaritySpec.
  val simRadiusIvf: Q = (s, d) =>
    SimilaritySearch.ivfRadiusSearch(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding",
      minCosine = 0.4, nCentroids = 8, nProbe = 8, iters = 2)

  // 12 planes / 4 tables over the same 48-plane budget as 8/6: finer
  // buckets (2^12 vs 2^8) cut the candidate set ~2x with recall still
  // comfortably above SimilaritySpec's floor — measured in SCALE.md.
  val simLshTopK: Q = (s, d) =>
    SimilaritySearch.lshTopK(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", k = 10,
      numPlanes = 12, numTables = 4)

  // IVF in its EXHAUSTIVE configuration (nProbe = nCentroids scores
  // every candidate) — the cell machinery runs for real but the result
  // provably equals brute force, so it shares sim_topk's value oracle.
  // Selective-probe recall is measured in SimilaritySpec.
  val simIvfTopK: Q = (s, d) =>
    SimilaritySearch.ivfTopK(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", k = 10,
      nCentroids = 8, nProbe = 8, iters = 2)

  // int8 scalar-quantized cosine top-k: dot products are EXACT integer
  // arithmetic, so the oracle replays quantization + scoring
  // bit-for-bit (only the final norm division is floating point).
  val simQuantTopK: Q = (s, d) =>
    SimilaritySearch.quantizedTopK(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", k = 10)

  // The production composition — IVF cells + int8 codegen scoring — in
  // its EXHAUSTIVE configuration (nProbe = nCentroids): the cell
  // machinery runs for real but the result provably equals quantized
  // brute force, so it shares sim_quant_topk's oracle (the sim_ivf_topk
  // pattern). Selective-probe recall is measured in RetrievalSpec.
  val simIvfQuant: Q = (s, d) =>
    SimilaritySearch.ivfQuantizedTopK(
      embeddings(s, d), queriesSubset(s, d), "vec_id", "embedding", k = 10,
      nCentroids = 8, nProbe = 8, iters = 2)

  // The MATERIALIZED serving shape: the int8+IVF index written at rest
  // partitionBy(cell) (array<tinyint> on disk — the real 8× cut), then
  // queried back with a static probe-cell partition filter (pruned
  // scan; PlanSpec pins PartitionFilters). Full probe ≡ quantized brute
  // force, so it shares sim_quant_topk's oracle.
  val simIvfAtRest: Q = (s, d) => {
    val dir = Sources.fixtureDir(s, "graft_ivfidx_")
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      embeddings(s, d), "vec_id", "embedding", dir.getAbsolutePath,
      // read-only serving index: no CDC sidecar needed (keyBuckets=0)
      nCentroids = 8, iters = 2, keyBuckets = 0)
    Sources.registerCleanup(dir)
    SimilaritySearch.ivfQuantizedTopKAtRest(
      s.read.parquet(dir.getAbsolutePath), queriesSubset(s, d),
      "vec_id", "embedding", k = 10,
      scale, cs, nProbe = 8)
  }

  // Incremental index maintenance end-to-end: build the at-rest index
  // on a BASE subset (vec_id % 5 != 4), then apply a deterministic CDC
  // change-set — deletes (% 13 == 0), updates (% 7 == 0 among
  // survivors; the vector is REVERSED, so updates genuinely move
  // across cells), inserts (the held-out % 5 == 4 rows) — via
  // upsertQuantizedIndex (dynamic partition overwrite of touched cells
  // only), and query the result with nProbe = nCells. The quantizer
  // scale is frozen from the base build; the oracle replays the base
  // scale, the post-CDC corpus (list_reverse for updates), and the
  // exact int8 arithmetic.
  val simIvfUpsert: Q = (s, d) => Tables.withShufflePartitions(s, 8) {
    val dir = Sources.fixtureDir(s, "graft_ivfups_")
    val e = embeddings(s, d)
    val base = e.where(pmod(col("vec_id"), lit(5)) =!= 4)
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      base, "vec_id", "embedding", dir.getAbsolutePath,
      // keyBuckets sized to the fixture (64 near-empty bucket dirs are
      // pure write overhead at this SF; production sizes this up)
      nCentroids = 8, iters = 2, keyBuckets = 8)
    Sources.registerCleanup(dir)
    val deletes = base.where(pmod(col("vec_id"), lit(13)) === 0)
      .select(col("vec_id"), col("embedding"), lit("D").as("op"))
    val updates = base.where(pmod(col("vec_id"), lit(13)) =!= 0 &&
        pmod(col("vec_id"), lit(7)) === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        lit("U").as("op"))
    val inserts = e.where(pmod(col("vec_id"), lit(5)) === 4)
      .select(col("vec_id"), col("embedding"), lit("I").as("op"))
    SimilaritySearch.upsertQuantizedIndex(
      deletes.unionByName(updates).unionByName(inserts),
      "vec_id", "embedding", "op", dir.getAbsolutePath, scale, cs)
    SimilaritySearch.ivfQuantizedTopKAtRest(
      s.read.parquet(dir.getAbsolutePath), queriesSubset(s, d),
      "vec_id", "embedding", k = 10, scale, cs, nProbe = 8)
  }

  // CONTINUOUS index maintenance: the same CDC change-set arrives as a
  // STREAM — two chronological micro-batches (deletes+updates, then
  // inserts; file source + maxFilesPerTrigger=1 in pinned-mtime order)
  // — and foreachBatch applies upsertQuantizedIndex per batch. This is
  // the production serving loop (Kafka CDC → foreachBatch → dynamic
  // partition overwrite of touched cells; state lives in the index
  // itself, so the stream needs no state store and restarts resume
  // from the sink checkpoint). Each batch has unique keys by
  // construction (D/U and I key sets are disjoint), so the final index
  // state equals the one-shot upsert and the entry shares
  // sim_ivf_upsert's oracle.
  // Fixture-scale parallelism cap (the st_* convention): the upsert's
  // internal shuffles carry tiny state here, so 32-task stages are
  // pure scheduling overhead; production sizes shuffle partitions up.
  val stIndexUpsert: Q = (s, d) => Tables.withShufflePartitions(s, 8) {
    val dir = Sources.fixtureDir(s, "graft_stidx_")
    val e = embeddings(s, d)
    val base = e.where(pmod(col("vec_id"), lit(5)) =!= 4)
    val (scale, cs) = SimilaritySearch.writeQuantizedIndex(
      base, "vec_id", "embedding", dir.getAbsolutePath,
      nCentroids = 8, iters = 2, keyBuckets = 8)
    Sources.registerCleanup(dir)
    val deletes = base.where(pmod(col("vec_id"), lit(13)) === 0)
      .select(col("vec_id"), col("embedding"), lit("D").as("op"))
    val updates = base.where(pmod(col("vec_id"), lit(13)) =!= 0 &&
        pmod(col("vec_id"), lit(7)) === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
        lit("U").as("op"))
    val inserts = e.where(pmod(col("vec_id"), lit(5)) === 4)
      .select(col("vec_id"), col("embedding"), lit("I").as("op"))
    val cdcDir = Sources.fixtureDir(s, "graft_stidx_cdc_")
    val t0 = System.currentTimeMillis() - 120000
    Sources.writeOrderedPart(
      deletes.unionByName(updates), cdcDir, "a.parquet", t0)
    Sources.writeOrderedPart(inserts, cdcDir, "b.parquet", t0 + 60000)
    val stream = s.readStream.schema(deletes.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"${cdcDir.getAbsolutePath}/*.parquet")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SimilaritySearch.upsertQuantizedIndex(
          batch, "vec_id", "embedding", "op", dir.getAbsolutePath,
          scale, cs)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    SimilaritySearch.ivfQuantizedTopKAtRest(
      s.read.parquet(dir.getAbsolutePath), queriesSubset(s, d),
      "vec_id", "embedding", k = 10, scale, cs, nProbe = 8)
  }

  /** Deterministic gray-PNG synthesis per media id (testdata carries no
    * real media, so the multimodal lane builds its own): dims
    * (16 + id%17) x (12 + id%11), pixel(x,y) = (id*31 + x*7 + y*13) %
    * 256 — an integer formula DuckDB replays with generate_series, which
    * is what makes a REAL decode pixel-exact-oracle-able (PNG is
    * lossless, so decode must return exactly these values). */
  private val encodePatternPng = udf((id: Long) => {
    val w = (16 + id % 17).toInt
    val h = (12 + id % 11).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = ((id * 31 + x * 7 + y * 13) % 256).toInt
        x += 1
      }
      y += 1
    }
    graft.ext.Multimodal.encodeGrayPng(w, h, px)
  })

  // Multimodal feature lane over REAL synthesized PNGs: encode the
  // deterministic pattern raster, then the real javax.imageio decode +
  // adaptive mean-pool runs distributed (graft.ext.Multimodal). The
  // driver pins the shape contract; pixel exactness is pinned by
  // mm_decode below and CodecSpec's round-trip tests.
  val mmFeatures: Q = (s, d) => {
    val media = documents(s, d)
      .select(col("doc_id").as("media_id"),
        encodePatternPng(col("doc_id")).as("content"))
    val withMeta = graft.ext.Multimodal.withImageMeta(media, "media_id", "content")
    graft.ext.Multimodal.extractFeatures(withMeta, gridW = 8, gridH = 8)
      .toDF()
      .select(col("media_id"),
        // Scalars only: the driver's pandas comparator can't sort/hash
        // array cells, so the (h, w) shape is emitted as two ints.
        col("embedding.shape").getItem(0).cast("int").as("shape_h"),
        col("embedding.shape").getItem(1).cast("int").as("shape_w"),
        size(col("embedding.values")).as("n_values"))
  }

  // REAL-decode pixel oracle: encode the pattern as PNG (lossless),
  // decode with javax.imageio (Multimodal.decodeGray), and emit dims +
  // the pixel sum. The oracle recomputes the expected sum from the
  // closed-form pattern — any decoder deviation (wrong dims, wrong
  // sample order, color-space drift) flips the hash. One media per 8
  // docs keeps the lane ~60 images at sf0.01.
  val mmDecode: Q = (s, d) => {
    val dec = udf((bytes: Array[Byte]) =>
      graft.ext.Multimodal.decodeGray(bytes).map { case (w, h, px) =>
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        (w, h, sum)
      })
    documents(s, d).where(pmod(col("doc_id"), lit(8)) === 0)
      .select(col("doc_id").as("media_id"),
        encodePatternPng(col("doc_id")).as("content"))
      .select(col("media_id"), dec(col("content")).as("__r"))
      .select(col("media_id"),
        col("__r").getField("_1").as("width"),
        col("__r").getField("_2").as("height"),
        col("__r").getField("_3").as("px_sum"))
  }

  // Video frame-sampling plan (multimodal lane 2): per media item, the
  // deterministic uniform-stride frame indices a decode stage would
  // fetch (Multimodal.sampleFrameIndices; the decode itself is the
  // declared stub boundary). Frame counts are synthesized from n_chars;
  // the oracle replays the integer stride arithmetic.
  val mmFrames: Q = (s, d) => {
    val sample = udf((n: Int) =>
      graft.ext.Multimodal.sampleFrameIndices(n, 8).toArray)
    documents(s, d)
      .select(col("doc_id").as("media_id"),
        (pmod(col("n_chars"), lit(200)) + 1).cast("int").as("n_frames"))
      .select(col("media_id"), col("n_frames"),
        explode(sample(col("n_frames"))).as("frame_idx"))
  }

  // CURATION FUNNEL (round-8 composition): the multi-criteria keep-set
  // a production pipeline computes as parallel INDEPENDENT verdicts
  // intersected at the end (each stage scans the corpus once; no stage
  // depends on another's output, so they run concurrently and cache
  // nothing) — per-domain cap ∩ Gopher keep ∩ not-perplexity-tail ∩
  // exact-dedup winner. Complements t_pipeline_e2e's SEQUENTIAL
  // composition. Every stage is its own oracled entry; the funnel
  // oracle joins their CTEs, so drift in any stage flips this hash
  // too.
  val tCurationFunnel: Q = (s, d) => {
    val cap = tDomainCap(s, d).select(col("doc_id"))
    val gopher = tGopherFilter(s, d).where(col("keep")).select(col("doc_id"))
    val buckets = tCcnetBuckets(s, d)
      .where(col("ppl_bucket") =!= "tail")
      .select(col("doc_id"), col("ppl_bucket"))
    val exactWinners = Dedup.exactGroups(documents(s, d), "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    documents(s, d).select(col("doc_id"), col("source"))
      .join(cap, Seq("doc_id"))
      .join(gopher, Seq("doc_id"))
      .join(buckets, Seq("doc_id"))
      .join(exactWinners, Seq("doc_id"))
  }

  // FUZZY (edit-distance) near-dup pairs — the entity-resolution lane
  // (names/titles/URLs): char-3-gram blocking (df-capped, shared >= 4)
  // over the lowercased 80-char key, then exact levenshtein <= 20
  // verify. The oracle replays blocking AND verify (DuckDB's
  // levenshtein is the same unit-cost edit distance), so a drift in
  // either stage flips the hash.
  val dedupFuzzy: Q = (s, d) =>
    Dedup.fuzzyPairs(documents(s, d), "doc_id", "text")

  // AUDIO lane (multimodal lane 3): per-doc PCM16 WAV binaries
  // synthesized row-locally from a closed-form sample formula, round
  // tripped through the REAL RIFF writer + chunk-walking parser, then
  // per-frame energy features. Everything cross-engine-exact: samples
  // are integers, Σs² is an exact long, and RMS is one
  // correctly-rounded sqrt per engine. The oracle replays the formula
  // arithmetically (DuckDB never sees the binary — the codec itself is
  // what the round trip tests; a corrupted header/chunk walk/sample
  // order would shift every energy).
  val mmAudio: Q = (s, d) => {
    import s.implicits._
    val frames = udf { (docId: Long) =>
      val ns = 800 + (docId % 5).toInt * 100
      val samples = Array.tabulate(ns)(i =>
        (((docId * 31 + i.toLong * 7) % 65536) - 32768).toShort)
      val wav = graft.ext.Multimodal.wavEncode(samples, 16000)
      val pcm = graft.ext.Multimodal.wavDecode(wav).get
      require(pcm.sampleRate == 16000 && pcm.channels == 1)
      graft.ext.Multimodal.frameSumSquares(pcm.samples, 256).toArray
    }
    documents(s, d).where(col("doc_id") < 64)
      .select(col("doc_id"), explode(frames(col("doc_id"))).as("f"))
      .select(col("doc_id"), col("f._1").as("frame_idx"),
        col("f._2").as("n"), col("f._3").as("sumsq"),
        graft.functions.DetRound.det6(
          sqrt(col("f._3").cast("double") / col("f._2"))).as("rms"))
  }

  // DATA MIXING with fractional epochs: every source resampled to a
  // deterministic per-source token budget (index mod 4 -> factor 0 /
  // 0.5 / 1.0 / 2.3 of its actual mass — exclusion, downsample,
  // passthrough, and fractional upsample all exercised). The md5
  // threshold draw and the budget arithmetic are replayed exactly in
  // the oracle, so the output MULTISET (including epoch indices) is
  // hash-checked, not just counts.
  val tMixture: Q = (s, d) => {
    val doc = documents(s, d)
    val totals = doc.groupBy(col("source")).agg(sum(col("n_chars")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def factor(idx: Int): Double = (idx % 4) match {
      case 0 => 0.0
      case 1 => 0.5
      case 2 => 1.0
      case _ => 2.3
    }
    val budgets = totals.map { case (src, t) =>
      src -> math.floor(t * factor(src.stripPrefix("src").toInt)).toLong
    }
    // zero-row corpus: no sources, no budgets — deliberate empty result
    if (budgets.isEmpty)
      doc.select(col("doc_id"), col("source"),
        lit(1L).as("mix_epoch")).limit(0)
    else
      Mixture(doc, "source", "n_chars", Seq("doc_id"), budgets)
        .select(col("doc_id"), col("source"), col("mix_epoch"))
  }

  /** Temperature-reweighted mixture (α = 0.5): each source's token
    * budget is floor(sqrt(n_src · n_min)) — the geometric mean of its
    * natural size and the smallest source's size, i.e. temperature
    * sampling's α = 0.5 point re-anchored at the smallest domain
    * (dominant sources down-weighted toward balance, the multilingual
    * pre-training recipe). Bit-exact across engines BY CONSTRUCTION:
    * n_src · n_min is exact integer arithmetic (guarded < 2^53), sqrt
    * is IEEE correctly rounded in both the JVM and DuckDB, and no
    * cross-source float sum exists anywhere — a conventionally
    * normalized Σ nᵅ budget would depend on float summation ORDER,
    * which no engine pair agrees on. */
  val tMixtureTemp: Q = (s, d) => {
    val doc = documents(s, d)
    val totals = doc.groupBy(col("source")).agg(sum(col("n_chars")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (totals.isEmpty)
      doc.select(col("doc_id"), col("source"),
        lit(1L).as("mix_epoch")).limit(0)
    else {
      val nMin = totals.values.min
      val budgets = totals.map { case (src, t) =>
        require(BigInt(t) * nMin < BigInt(1L << 53),
          s"geometric-mean budget for $src exceeds exact double range")
        src -> math.floor(math.sqrt((t * nMin).toDouble)).toLong
      }
      Mixture(doc, "source", "n_chars", Seq("doc_id"), budgets)
        .select(col("doc_id"), col("source"), col("mix_epoch"))
    }
  }

  /** Duplicated-SPAN removal (RefinedWeb-style): repeated boilerplate
    * passages recur inside otherwise-distinct documents, where whole-doc
    * dedup never looks. Non-overlapping 200-codepoint spans; a span
    * that recurs anywhere in the corpus survives only at its first
    * (doc_id, idx) occurrence; docs reassemble from surviving spans.
    * See [[graft.ext.Dedup.spanDedup]] for the window-free scale shape. */
  val tSpanDedup: Q = (s, d) =>
    Dedup.spanDedup(documents(s, d), "doc_id", "text", chunkSize = 200)
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))

  /** Mutual-kNN graph edges — the SemDeDup / SSL-curation building
    * block: edge (a, b) exists iff b is in a's top-k cosine neighbors
    * AND a is in b's. Exact formulation (the corpus is its own query
    * set); each unordered pair is scored ONCE (cosine is bitwise
    * symmetric) and fanned to both directions, and per-node top-k runs
    * through [[graft.operators.TopKPerKey]]'s k-bounded partial
    * aggregation — shuffle O(nodes × k), no per-node window sort (the
    * window form sorts every node's full candidate list; measured 6.2 s
    * → this shape at sf0.1). At 100 TB the candidate pairs come from
    * the IVF/LSH entries and the same capped agg + mutuality semi-join
    * run on top, unchanged. */
  val simKnnMutual: Q = (s, d) => {
    val e = embeddings(s, d)
    val p = s.sparkContext.defaultParallelism
    val a = e.select(col("vec_id").as("id_a"),
      col("embedding").cast("array<double>").as("__va")).repartition(p)
    val b = e.select(col("vec_id").as("id_b"),
      col("embedding").cast("array<double>").as("__vb"))
    val both = a.crossJoin(broadcast(b))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.functions.DetRound.det6(
        Dedup.cosineCol(col("__va"), col("__vb"))))
      .select(explode(array(
        struct(col("id_a").as("q"), col("id_b").as("c"), col("cosine")),
        struct(col("id_b").as("q"), col("id_a").as("c"), col("cosine"))))
        .as("r"))
      .select(col("r.q"), col("r.c"), col("r.cosine"))
    // tiny after the cap (nodes × k rows): checkpoint so the two
    // mutuality branches don't recompute the scoring scan
    val tk = graft.operators.TopKPerKey(
      both, Seq("q"), "cosine", "c", k = 10).localCheckpoint()
    val ab = tk.where(col("q") < col("c"))
      .select(col("q").as("id_a"), col("c").as("id_b"), col("cosine"))
    val ba = tk.where(col("q") > col("c"))
      .select(col("c").as("id_a"), col("q").as("id_b"))
    ab.join(ba, Seq("id_a", "id_b"), "left_semi")
  }

  // The IVF-BOUNDED mutual-kNN lane in its EXHAUSTIVE configuration
  // (nProbe = nCentroids → every directed pair is a candidate): cell
  // machinery + capped agg + mutuality semi-join run for real, result
  // provably equals the exact graph, oracle shared with sim_knn_mutual.
  // Selective-probe recall is measured in SimilaritySpec.
  val simKnnMutualIvf: Q = (s, d) =>
    SimilaritySearch.ivfKnnMutual(
      embeddings(s, d), "vec_id", "embedding", k = 10,
      nCentroids = 8, nProbe = 8, iters = 2)

  // Anchor-seeded nearest-centroid labeling (k-means INFERENCE under a
  // frozen model — the IVF cell-assign step exposed as an operator):
  // anchors = the first 8 vectors (vec_id < 8), collected driver-side
  // (8 × 64 doubles) and inlined as array literals, so the whole
  // assignment is ONE codegen'd projection — zero shuffle, zero join.
  // The oracle replays the full argmax (cosine DESC, anchor-id ASC tie).
  private def anchorSet(s: SparkSession, d: String): Seq[(Long, Seq[Double])] =
    embeddings(s, d).where(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
      .sortBy(_._1).toSeq

  val simCentroidAssign: Q = (s, d) => {
    val anchors = anchorSet(s, d)
    // zero-row corpus → no anchors: deliberate empty frame with the
    // output schema (the operator's >= 2-anchor contract is for real
    // anchor sets, not an empty-partition crash)
    if (anchors.size < 2)
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id long, cluster_id long, cosine double"))
    else
      SimilaritySearch.nearestAnchor(
        embeddings(s, d), "vec_id", "embedding", anchors)
  }

  // One Lloyd (k-means) iteration from the same pinned anchors:
  // assignment scan + per-(cluster, dim) FIXED-POINT mean (det6
  // components as decimal(18,6) — exact, order-independent sums, so the
  // distributed mean is bit-reproducible and DuckDB-replayable; the
  // decimal→double cast stays exact while |sum×10⁶| < 2^53, true
  // through sf10 for unit-scale embeddings).
  val simKmeansStep: Q = (s, d) => {
    val anchors = anchorSet(s, d)
    if (anchors.size < 2)
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "cluster_id long, dim int, centroid double"))
    else
      SimilaritySearch.kmeansStep(
        embeddings(s, d), "vec_id", "embedding", anchors)
  }

  // Per-domain document cap (the C4/RefinedWeb "at most N pages per
  // domain" rule): keep 15 docs per source, chosen by the portable
  // md5-threshold draw (seed 97) so the kept set is stable across runs
  // and partitionings. TopKPerKey's k-bounded map-side heap ships at
  // most 15 rows per (partition, source) to the shuffle — never a
  // per-domain sort, which a hot domain (10^8 pages at 100 TB) would
  // serialize into one task.
  val tDomainCap: Q = (s, d) => {
    val draw = graft.operators.BalancedSample.hash60(Seq(col("doc_id")), 97L)
    graft.operators.TopKPerKey(
      documents(s, d).withColumn("__draw", draw),
      Seq("source"), "__draw", "doc_id", k = 15)
      .select(col("source"), col("doc_id"), col("rank"))
  }

  // Incremental (batch-vs-corpus) exact dedup — the nightly-crawl shape:
  // the at-rest corpus (even doc_ids) holds 60-bit content hashes; the
  // arriving batch (odd doc_ids) drops rows whose hash already exists,
  // then keeps one winner (min doc_id) per in-batch duplicate group.
  // BloomPrune filters the batch MAP-SIDE against a broadcast bloom of
  // the corpus hashes: at 100 TB the corpus never shuffles against the
  // batch — only probable matches reach the exact anti join that
  // removes bloom false positives.
  val dedupIncremental: Q = (s, d) => {
    val h = graft.functions.VectorFunctions.hex60_to_long(
      md5(coalesce(col("text"), lit(""))))
    // Checkpoint the narrow (id, hash) projection: corpus and batch both
    // derive from the one documents scan, and BloomPrune runs multiple
    // jobs (key count, bloom build, join) — without it the text scan +
    // md5 kernel re-executes per job. 16 bytes/row; in production the
    // corpus hash set is its own at-rest table and this is a plain read.
    val docs = documents(s, d).select(col("doc_id"), h.as("h"))
      .localCheckpoint()
    val corpus = docs.where(col("doc_id") % 2 === 0).select(col("h"))
    val batch = docs.where(col("doc_id") % 2 === 1)
    graft.operators.BloomPrune.antiJoin(batch, corpus, "h", "h")
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
  }

  // CCNet-style perplexity bucketing: unigram surprisal (t_surprisal's
  // model, det6-pinned so the sort key is bit-identical cross-engine) →
  // exact global tertiles via GlobalRank.withNtile (never an
  // unpartitioned ntile window). Training pipelines keep "head", mix
  // "middle", drop "tail".
  val tCcnetBuckets: Q = (s, d) => {
    // Checkpoint the (doc_id, surprisal) frame: GlobalRank's rank scan
    // is multi-action, and each action would otherwise re-run the
    // tokenize + TreeMap surprisal kernel over the full text column.
    // Two scalar columns per row — 100-1000× smaller than the text.
    val sur = Retrieval.surprisal(documents(s, d), "doc_id", "text")
      .localCheckpoint()
    graft.operators.GlobalRank.withNtile(
      sur, "__tile", 3, Seq(col("surprisal"), col("doc_id")))
      .select(col("doc_id"), col("surprisal"),
        when(col("__tile") === 1, "head")
          .when(col("__tile") === 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  // LEAKAGE-SAFE train/val/test split: the split is drawn from the
  // near-dup CLUSTER id, not the doc id, so every member of a dup
  // cluster lands in the same split — the contamination-by-duplication
  // failure mode (train/test near-dup leakage silently inflating eval)
  // is structurally impossible. Composition of two already-oracled
  // stages (LSH clusters + md5-threshold draw); the oracle replays the
  // whole chain, so drift in either stage flips the hash.
  val tLeakageSplit: Q = (s, d) => {
    val pairs = Dedup.minhashLshPairs(documents(s, d), "doc_id", "text",
      threshold = 0.5)
    val clusters = Dedup.nearDedupClusters(documents(s, d), "doc_id", pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
    val draw = graft.operators.BalancedSample.hash60(
      Seq(col("cluster_id")), 42L)
    val twoPow60 = math.pow(2.0, 60)
    clusters.select(col("doc_id"), col("cluster_id"),
      when(draw < lit(0.8 * twoPow60), "train")
        .when(draw < lit(0.9 * twoPow60), "val")
        .otherwise("test").as("split"))
  }

  // Duplicate clusters: MinHash-LSH pairs → connected components →
  // every doc labeled with its cluster's canonical (min) id.
  val dedupClusters: Q = (s, d) => {
    val pairs = Dedup.minhashLshPairs(documents(s, d), "doc_id", "text",
      threshold = 0.5)
    Dedup.nearDedupClusters(documents(s, d), "doc_id", pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
  }

  // Flagship end-to-end dedup pipeline (exact → MinHash-LSH → connected
  // components → keep-set): the rows that survive dedup at threshold 0.5.
  // Oracle = the recursive-CTE transitive closure restricted to its
  // canonical (minimum-id) members. NOTE the pipeline also merges exact
  // duplicates too short to shingle (strictly better dedup than the
  // jaccard closure); this corpus has no such rows (all dup texts have
  // ≥ 11 tokens), so the keep-sets coincide — asserted by the oracle.
  val dedupPipelineKeep: Q = (s, d) =>
    Dedup.pipelineKeep(documents(s, d), "doc_id", "text", threshold = 0.5)
      .select(col("doc_id"))

  // ε-differentially-private released counts (Laplace mechanism,
  // sensitivity 1, ε = 0.5): corpus composition per (source, lang)
  // with calibrated noise — the privacy lane's release half, next to
  // t_k_anon's suppression half. The "random" draw is a keyed PRF
  // (the portable 60-bit md5 over the group key + seed) mapped through
  // the Laplace inverse-CDF — exactly how DP release pipelines make
  // their noise replayable for audit, and what makes this entry
  // value-checkable cross-engine. Scale: one map-side-combined
  // aggregate; the noise is a per-GROUP scalar projection (O(groups)
  // rows), nothing touches row-level data after the count.
  val tDpCounts: Q = (s, d) => {
    val b = 2.0 // scale = sensitivity/ε = 1/0.5
    val u = graft.operators.BalancedSample.hash60(
      Seq(col("source"), col("lang")), 41L) / lit(1.152921504606846976e18)
    val shifted = u - lit(0.5)
    val noise = lit(-b) * signum(shifted) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(shifted)))
    documents(s, d).groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("__n"))
      .select(col("source"), col("lang"),
        graft.functions.DetRound.det6(col("__n").cast("double") + noise)
          .as("n_dp"))
  }

  // Weighted sampling WITHOUT replacement, distributed: the
  // Efraimidis–Spirakis A-ES scheme — per-row key ln(u)/w with u a
  // keyed-PRF uniform, take the k largest keys. One pass, no
  // sequential draw-and-remove state, and the top-k runs as
  // TakeOrderedAndProject (per-partition heaps + driver merge of k),
  // never a global sort — the standard way to sample a 100 TB corpus
  // by token-count weight in one job. The PRF draw makes the sample a
  // pure function of the corpus: the oracle replays the identical
  // arithmetic and must select the identical 100 docs.
  val tWeightedSample: Q = (s, d) => {
    val u = greatest(
      graft.operators.BalancedSample.hash60(Seq(col("doc_id")), 99L) /
        lit(1.152921504606846976e18),
      lit(1e-18)) // u=0 would send ln to -inf; clamp is replayed in SQL
    val w = (coalesce(col("n_chars"), lit(0L)) + lit(1L)).cast("double")
    documents(s, d)
      .select(col("doc_id"), col("n_chars"), (log(u) / w).as("__key"))
      .orderBy(col("__key").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("n_chars"))
  }

  // EXACT-k stratified sample: exactly min(k, |stratum|) docs per
  // source, selected by a keyed-PRF order — the "same eval slice every
  // run" sampler (BalancedSample is Bernoulli: k only in expectation).
  // Runs as TopKPerKey's bounded heap — O(n log k) per stratum and
  // shuffle O(strata × k), never a per-stratum full sort; a hot stratum
  // costs a heap, not a partition sort. The order key is hash60's
  // DOUBLE image (the 60-bit integer rounds identically under IEEE
  // round-to-nearest in both engines — the t_weighted_sample
  // precedent); rounding-collision ties break on doc_id in both. The
  // oracle replays the identical order and must pick the identical
  // rows with identical ranks.
  val tStratifiedSample: Q = (s, d) => {
    val h = graft.operators.BalancedSample.hash60(Seq(col("doc_id")), 77L)
    val scored = documents(s, d)
      .select(col("source"), col("doc_id"), (-h).as("__sc"))
    graft.operators.TopKPerKey(scored, Seq("source"), "__sc", "doc_id", 20)
      .select(col("source"), col("doc_id"), col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "t_stratified_sample" -> tStratifiedSample,
    "t_weighted_sample" -> tWeightedSample,
    "t_dp_counts" -> tDpCounts,
    "sim_centroid_assign" -> simCentroidAssign,
    "sim_radius" -> simRadius,
    "sim_radius_ivf" -> simRadiusIvf,
    "sim_knn_mutual_ivf" -> simKnnMutualIvf,
    "sim_kmeans_step" -> simKmeansStep,
    "t_domain_cap" -> tDomainCap,
    "dedup_incremental" -> dedupIncremental,
    "t_ccnet_buckets" -> tCcnetBuckets,
    "dedup_clusters" -> dedupClusters,
    "dedup_pipeline_keep" -> dedupPipelineKeep,
    "mm_features" -> mmFeatures,
    "mm_frames" -> mmFrames,
    "mm_audio" -> mmAudio,
    "dedup_fuzzy" -> dedupFuzzy,
    "t_curation_funnel" -> tCurationFunnel,
    "mm_decode" -> mmDecode,
    "t_heavy_hitters" -> tHeavyHitters,
    "t_k_anon" -> tKAnon,
    "t_token_stats" -> tTokenStats,
    "t_winnow" -> tWinnow,
    "dedup_winnow" -> dedupWinnow,
    "t_lang_id" -> tLangId,
    "t_quality" -> tQuality,
    "t_seq_pack" -> tSeqPack,
    "t_bpe_tokens" -> tBpeTokens,
    "t_bpe_train" -> tBpeTrain,
    "t_seq_pack_bpe" -> tSeqPackBpe,
    "t_split" -> tSplit,
    "t_leakage_split" -> tLeakageSplit,
    "t_mixture" -> tMixture,
    "t_mixture_temp" -> tMixtureTemp,
    "t_span_dedup" -> tSpanDedup,
    "sim_knn_mutual" -> simKnnMutual,
    "t_shuffle_rank" -> tShuffleRank,
    "t_vocab" -> tVocab,
    "dedup_exact" -> dedupExact,
    "dedup_jaccard" -> dedupJaccard,
    "dedup_jaccard_capped" -> dedupJaccardCapped,
    "dedup_minhash" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_semantic_keep" -> dedupSemanticKeep,
    "sim_topk" -> simTopK,
    "sim_lsh_topk" -> simLshTopK,
    "sim_ivf_topk" -> simIvfTopK,
    "sim_quant_topk" -> simQuantTopK,
    "sim_ivf_quant" -> simIvfQuant,
    "sim_ivf_at_rest" -> simIvfAtRest,
    "sim_ivf_upsert" -> simIvfUpsert,
    "st_index_upsert" -> stIndexUpsert,
    "t_bm25" -> tBm25,
    "t_contamination" -> tContamination,
    "t_redact" -> tRedact,
    "t_repetition" -> tRepetition,
    "t_surprisal" -> tSurprisal,
    "t_surprisal2" -> tSurprisal2,
    "t_chunk" -> tChunk,
    "t_pipeline_e2e" -> tPipelineE2e,
    "t_gopher_filter" -> tGopherFilter,
    "t_tfidf_terms" -> tTfidfTerms,
    "t_curriculum" -> tCurriculum)

  // DuckDB token expression mirroring TF.tokens exactly.
  private val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  // DuckDB 3-shingle expression over a token list column `t` (1-based,
  // mirroring TF.shingles).
  private val shinglesSql =
    """list_distinct(list_transform(
      |  range(1, greatest(len(t) - 1, 1)),
      |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))""".stripMargin

  private val jaccardOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest($shinglesSql) AS s
       |  FROM toks WHERE len(t) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  floor(inter * 1.0 / (sa.n + sb.n - inter) * 1000000 + 0.5) / 1000000
       |    AS jaccard
       |FROM pairs
       |JOIN sz sa ON id_a = sa.doc_id
       |JOIN sz sb ON id_b = sb.doc_id
       |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5""".stripMargin

  // The pinned BPE merge table rendered as delimiter-framed replace
  // rules — GENERATED from Bpe.merges, so kernel and oracle can never
  // drift. The recursive CTE applies rule i by replace() until the
  // string stops changing, then advances to rule i+1 (exactly the
  // kernel's per-rule-fixpoint semantics; confluent because left≠right
  // for every rule — see Bpe scaladoc).
  private val bpeMergesValues = Bpe.merges.zipWithIndex.map {
    case ((a, b), i) => s"(${i + 1}, '|$a|$b|', '|$a$b|')"
  }.mkString(", ")

  private val bpeEncCte =
    s"""vocab AS (
       |  SELECT DISTINCT unnest($toksSql) AS w FROM documents),
       |m AS (SELECT * FROM (VALUES $bpeMergesValues) v(i, pat, rep)),
       |enc AS (
       |  SELECT w, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
       |    1 AS i
       |  FROM vocab
       |  UNION ALL
       |  SELECT e.w, replace(e.s, m.pat, m.rep) AS s,
       |    CASE WHEN replace(e.s, m.pat, m.rep) = e.s THEN e.i + 1
       |         ELSE e.i END AS i
       |  FROM enc e JOIN m ON m.i = e.i
       |  WHERE e.i <= ${Bpe.merges.length}),
       |done AS (SELECT w, s FROM enc WHERE i = ${Bpe.merges.length + 1}),
       |wc AS (SELECT w,
       |    CAST(length(s) - length(replace(s, '|', '')) - 1 AS BIGINT) AS n
       |  FROM done)""".stripMargin

  // jaccardOracle with the df cap replayed: shingles in more than 3
  // docs are dropped before sizes and pair counts (exactly what
  // Dedup.jaccardPairs(maxShingleDf = Some(3)) does).
  private val cappedJaccardOracle =
    s"""WITH toks AS (
       |  SELECT doc_id, $toksSql AS t FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest($shinglesSql) AS s
       |  FROM toks WHERE len(t) >= 3),
       |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 3),
       |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN keep ON sh0.s = keep.s),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  floor(inter * 1.0 / (sa.n + sb.n - inter) * 1000000 + 0.5) / 1000000
       |    AS jaccard
       |FROM pairs
       |JOIN sz sa ON id_a = sa.doc_id
       |JOIN sz sb ON id_b = sb.doc_id
       |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5""".stripMargin

  private def langCase: String = {
    val scores = TF.langMarkers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      lang -> s"len(list_filter(t, x -> list_contains($lst, x)))"
    }
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    val whens = scores.map { case (lang, sc) =>
      s"WHEN $sc = best AND best > 0 THEN '$lang'" }.mkString("\n    ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |scored AS (SELECT doc_id, t, $best AS best FROM toks)
       |SELECT doc_id, CASE
       |    $whens
       |    ELSE 'und' END AS lang_pred
       |FROM scored""".stripMargin
  }

  // Transitive closure of the (exact-jaccard) pair set via recursive
  // reachability; component label = min reachable id; singletons map
  // to themselves. Pair set == dedup_jaccard's (minhash output is
  // exact-verified, no false negatives in this data's gap).
  private val clusterCte =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, $toksSql AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest($shinglesSql) AS s
       |  FROM toks WHERE len(t) >= 3),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pr AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM pr
       |  JOIN sz sa ON id_a = sa.doc_id
       |  JOIN sz sb ON id_b = sb.doc_id
       |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.dst AS id, reach.r
       |  FROM reach JOIN edges e ON reach.id = e.src)""".stripMargin

  /** Winnowing replication: same normalization, same 60-bit md5-prefix
    * gram hash, window minima via `min() OVER (ROWS w-1 PRECEDING)`.
    * Prefix rows (rn < w) are incomplete windows and are excluded,
    * except a doc with fewer than w grams keeps its LAST row — the
    * whole-text window (rn >= least(w, m) covers both cases). */
  private val winnowFpsCte: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    lower(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, CAST(u.i AS INT) AS i,
      |    CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INT), 25)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM docs, unnest(range(1, len(t) - 25 + 2)) AS u(i)
      |), wmins AS (
      |  SELECT doc_id,
      |    min(h) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS fp,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS m
      |  FROM grams
      |), fps AS (
      |  SELECT DISTINCT doc_id, fp FROM wmins WHERE rn >= least(16, m)
      |)""".stripMargin

  // Shared CTE prefix for the anchor-assignment oracles: exact cosine
  // against the vec_id < 8 anchor set, argmax by (cosine DESC, aid ASC)
  // — mirrors nearestAnchor's greatest() over (det6 cosine, -aid)
  // structs, with the same operand order in every float op (dot folds
  // ascending zip index; denominator = norm(anchor) * norm(vector)).
  private lazy val anchorAssignCte: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |a AS (SELECT vec_id AS aid, v AS av FROM e WHERE vec_id < 8),
      |sc AS (SELECT e.vec_id, a.aid,
      |    floor(
      |      list_reduce(list_transform(list_zip(a.av, e.v), z -> z[1] * z[2]),
      |        (x, y) -> x + y)
      |      / (sqrt(list_reduce(list_transform(a.av, x -> x * x), (x, y) -> x + y))
      |       * sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y)))
      |      * 1000000 + 0.5) / 1000000 AS cosine
      |  FROM e, a),
      |asn AS (SELECT vec_id, aid, cosine FROM (
      |    SELECT vec_id, aid, cosine, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY cosine DESC, aid) AS rn
      |    FROM sc) WHERE rn = 1)""".stripMargin

  // Blocking + verify for the fuzzy lane, CTE-ized so both the pair
  // entry and the recursive-closure entry replay one definition.
  private lazy val fuzzyPairsCte: String =
    """WITH RECURSIVE k AS (SELECT doc_id,
      |    lower(substr(coalesce(text, ''), 1, 80)) AS s FROM documents),
      |g AS (SELECT DISTINCT doc_id, substr(s, i, 3) AS gr
      |  FROM k, LATERAL (SELECT unnest(range(1,
      |    greatest(len(s) - 2, 0) + 1)) AS i) r),
      |rare AS (SELECT gr FROM (
      |  SELECT gr, count(*) AS d FROM g GROUP BY 1)
      |  WHERE d <= least(
      |    ceil(0.2 * (SELECT count(*) FROM documents)), 10000)),
      |gg AS (SELECT g.* FROM g JOIN rare USING (gr)),
      |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    count(*) AS shared
      |  FROM gg a JOIN gg b ON a.gr = b.gr AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 4),
      |fpairs AS (SELECT id_a, id_b, shared,
      |    CAST(levenshtein(ka.s, kb.s) AS INT) AS dist
      |  FROM cand
      |  JOIN k ka ON cand.id_a = ka.doc_id
      |  JOIN k kb ON cand.id_b = kb.doc_id
      |  WHERE levenshtein(ka.s, kb.s) <= 20)""".stripMargin

  private lazy val domainCapOracle: String =
    """WITH d AS (SELECT source, doc_id,
      |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
      |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '97')), 1, 15))
      |      AS UBIGINT) AS DOUBLE) AS draw
      |  FROM documents)
      |SELECT source, doc_id, CAST(rank AS INT) AS rank FROM (
      |  SELECT source, doc_id, row_number() OVER (
      |      PARTITION BY source ORDER BY draw DESC, doc_id) AS rank
      |  FROM d)
      |WHERE rank <= 15""".stripMargin

  private lazy val ccnetBucketsOracle: String =
    s"""WITH s AS ($surprisalOracle)
       |SELECT doc_id, surprisal,
       |  CASE CAST(ntile(3) OVER (ORDER BY surprisal, doc_id) AS INT)
       |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
       |    AS ppl_bucket
       |FROM s""".stripMargin

  // Shared by the brute entry and its exhaustive-IVF twin (full probe
  // provably equals brute force — see simRadiusIvf / simKnnMutualIvf).
  private lazy val simKnnMutualOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |scored AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
      |    floor(
      |      list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
      |        (x, y) -> x + y)
      |      / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))
      |       * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)))
      |      * 1000000 + 0.5) / 1000000 AS cosine
      |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
      |ranked AS (SELECT qa, qb, cosine,
      |    row_number() OVER (PARTITION BY qa
      |      ORDER BY cosine DESC, qb) AS rank
      |  FROM scored)
      |SELECT r1.qa AS id_a, r1.qb AS id_b, r1.cosine
      |FROM ranked r1 JOIN ranked r2 ON r1.qa = r2.qb AND r1.qb = r2.qa
      |WHERE r1.rank <= 10 AND r2.rank <= 10 AND r1.qa < r1.qb""".stripMargin

  private lazy val simRadiusOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 20)
      |SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
      |  floor(
      |    list_reduce(list_transform(list_zip(q.v, e.v), z -> z[1] * z[2]),
      |      (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y)))
      |    * 1000000 + 0.5) / 1000000 AS cosine
      |FROM q JOIN e ON q.vec_id <> e.vec_id
      |WHERE floor(
      |    list_reduce(list_transform(list_zip(q.v, e.v), z -> z[1] * z[2]),
      |      (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y)))
      |    * 1000000 + 0.5) / 1000000 >= 0.4""".stripMargin

  // t_bpe_train value oracle: the trainer is DETERMINISTIC given the
  // corpus (BpeSpec proves the distributed trainer equals an
  // independent sequential reference, and the selection rule is
  // max-count with lexicographic tie-break — no engine arbitrariness),
  // so the merges learned from the driver's sf0.01 documents fixture
  // are PINNED as a VALUES literal — the goldens pattern
  // (ref: oarphpy_test/test_util/test_misc.py:115-126). Fixture-bound
  // by construction: regenerate via
  //   runMain graft.Verify /root/testdata/sf0.01 <out> t_bpe_train
  // if the driver's corpus ever changes.
  private lazy val bpeTrainOracle: String = {
    val rows = Seq(
      (1, "e", "r"), (2, "i", "n"), (3, "o", "w"), (4, "o", "r"),
      (5, "s", "t"), (6, "m", "er"), (7, "a", "t"), (8, "l", "u"),
      (9, "a", "r"), (10, "p", "ar"), (11, "j", "o"), (12, "jo", "in"),
      (13, "a", "s"), (14, "as", "h"), (15, "h", "ash"), (16, "r", "ow"),
      (17, "at", "c"), (18, "atc", "h"), (19, "b", "atch"),
      (20, "a", "n"), (21, "c", "an"), (22, "s", "can"), (23, "c", "o"),
      (24, "c", "u"), (25, "co", "lu"), (26, "colu", "m"),
      (27, "colum", "n"), (28, "cu", "st"), (29, "cust", "o"),
      (30, "custo", "mer"), (31, "f", "i"), (32, "fi", "l"),
      (33, "fil", "t"), (34, "filt", "er"), (35, "a", "l"),
      (36, "al", "l"), (37, "m", "all"), (38, "s", "mall"),
      (39, "g", "e"), (40, "l", "ow"), (41, "mer", "ge"),
      (42, "s", "low"), (43, "c", "t"), (44, "ct", "or"),
      (45, "d", "er"), (46, "e", "ctor"), (47, "or", "der"),
      (48, "v", "ector"), (49, "in", "e"), (50, "l", "ine"))
    val values = rows.map { case (r, a, b) => s"($r, '$a', '$b')" }
      .mkString(",\n  ")
    s"""SELECT * FROM (VALUES\n  $values\n) AS t(rank, "left", "right")"""
  }

  val oracles: Map[String, String] = Map(
    // Same PRF order: the 60-bit md5 integer's DOUBLE image, asc,
    // doc_id tiebreak; row_number caps each stratum at exactly 20.
    "t_stratified_sample" ->
      """WITH h AS (SELECT source, doc_id,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
        |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '77')),
        |      1, 15)) AS UBIGINT) AS DOUBLE) AS hs
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY hs, doc_id) AS rank
        |  FROM h)
        |SELECT source, doc_id, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 20""".stripMargin,
    // The A-ES draw replayed: same 60-bit md5 uniform, same clamp,
    // same ln(u)/w ordering — the selected 100 must be identical.
    "t_weighted_sample" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |    greatest(CAST(CAST(('0x' || substr(md5(concat_ws(':',
        |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '99')),
        |      1, 15)) AS UBIGINT) AS DOUBLE) / 1152921504606846976.0,
        |      1e-18) AS uu
        |  FROM documents)
        |SELECT doc_id, n_chars FROM u
        |ORDER BY ln(uu) / CAST(coalesce(n_chars, 0) + 1 AS DOUBLE) DESC,
        |  doc_id
        |LIMIT 100""".stripMargin,
    // Replays the keyed-PRF Laplace draw: 60-bit md5 uniform over
    // (source, lang, seed 41) → inverse-CDF with the same 1e-12 clamp
    // and the same 1e-6 floor-round. ln is libm on both engines; the
    // 6dp round absorbs any last-ulp divergence.
    "t_dp_counts" ->
      """WITH c AS (SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |u AS (SELECT source, lang, n,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
        |      coalesce(source, chr(1)), coalesce(lang, chr(1)), '41')),
        |      1, 15)) AS UBIGINT) AS DOUBLE) / 1152921504606846976.0
        |      - 0.5 AS su
        |  FROM c)
        |SELECT source, lang,
        |  floor((n + (-2.0) * sign(su)
        |    * ln(greatest(1e-12, 1.0 - 2.0 * abs(su)))) * 1000000 + 0.5)
        |    / 1000000 AS n_dp
        |FROM u""".stripMargin,
    "t_bpe_train" -> bpeTrainOracle,
    "sim_radius" -> simRadiusOracle,
    "sim_radius_ivf" -> simRadiusOracle,
    "sim_centroid_assign" ->
      s"""$anchorAssignCte
         |SELECT vec_id, aid AS cluster_id, cosine FROM asn""".stripMargin,
    "sim_kmeans_step" ->
      s"""$anchorAssignCte,
         |x AS (SELECT asn.aid AS cluster_id, i - 1 AS dim,
         |    CAST(floor(e.v[i] * 1000000 + 0.5) / 1000000
         |      AS DECIMAL(18,6)) AS xr
         |  FROM asn JOIN e USING (vec_id),
         |    LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS i) r)
         |SELECT cluster_id, CAST(dim AS INT) AS dim,
         |  floor(CAST(sum(xr) AS DOUBLE) / count(*) * 1000000 + 0.5)
         |    / 1000000 AS centroid
         |FROM x GROUP BY 1, 2""".stripMargin,
    "t_domain_cap" -> domainCapOracle,
    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(coalesce(text, '')), 1, 15))
        |      AS UBIGINT) AS h
        |  FROM documents),
        |c AS (SELECT h FROM d WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, h FROM d WHERE doc_id % 2 = 1)
        |SELECT min(doc_id) AS doc_id FROM b
        |WHERE h NOT IN (SELECT h FROM c) GROUP BY h""".stripMargin,
    "t_ccnet_buckets" -> ccnetBucketsOracle,
    // Funnel = intersection of four independently-oracled keep-sets;
    // each stage's full CTE is inlined, so any stage drift flips this
    // hash as well as its own entry's.
    "t_curation_funnel" ->
      s"""WITH capk AS (SELECT doc_id FROM ($domainCapOracle) c),
         |gk AS (SELECT doc_id FROM (__GOPHER__) g WHERE g.keep),
         |bk AS (SELECT doc_id, ppl_bucket FROM ($ccnetBucketsOracle) b
         |  WHERE ppl_bucket <> 'tail'),
         |ek AS (SELECT min(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(text))
         |SELECT d.doc_id, d.source, bk.ppl_bucket
         |FROM documents d
         |JOIN capk USING (doc_id) JOIN gk USING (doc_id)
         |JOIN bk USING (doc_id) JOIN ek USING (doc_id)""".stripMargin
        .replace("__GOPHER__", gopherFilterOracle),
    "t_winnow" ->
      s"""$winnowFpsCte
         |SELECT doc_id, CAST(count(*) AS INT) AS n_fp, bit_xor(fp) AS fp_xor
         |FROM fps GROUP BY doc_id""".stripMargin,
    "dedup_winnow" ->
      s"""$winnowFpsCte
         |SELECT l.doc_id AS a, r.doc_id AS b, CAST(count(*) AS INT) AS n_shared
         |FROM fps l JOIN fps r ON l.fp = r.fp AND l.doc_id < r.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 3""".stripMargin,
    "dedup_clusters" ->
      s"""$clusterCte
         |SELECT d.doc_id,
         |  coalesce((SELECT min(r) FROM reach WHERE reach.id = d.doc_id),
         |           d.doc_id) AS cluster_id
         |FROM documents d""".stripMargin,
    // Whole-chain replication: the dedup_clusters closure → the
    // t_split md5 draw, drawn from the CLUSTER id (seed 42).
    // Mixture replication: identical budget arithmetic (floor(t *
    // factor) as BIGINT over exact integer sums), identical rate
    // division, identical md5 60-bit threshold, epochs via
    // unnest(range(...)) (empty list when copies = 0 drops the row —
    // the lateral-free spelling this DuckDB supports).
    "t_mixture" ->
      """WITH tot AS (SELECT source, sum(n_chars) AS t
        |  FROM documents GROUP BY 1),
        |r AS (SELECT source, t,
        |    CAST(floor(t * CASE CAST(substr(source, 4) AS INT) % 4
        |      WHEN 0 THEN 0.0 WHEN 1 THEN 0.5 WHEN 2 THEN 1.0
        |      ELSE 2.3 END) AS BIGINT) AS b
        |  FROM tot),
        |rr AS (SELECT source, CAST(b AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS rate
        |  FROM r WHERE t > 0),
        |d AS (SELECT doc_id, dd.source, rate,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
        |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '1337')), 1, 15))
        |      AS UBIGINT) AS DOUBLE) AS u
        |  FROM documents dd JOIN rr ON dd.source = rr.source),
        |c AS (SELECT doc_id, source,
        |    CAST(floor(rate) AS BIGINT) +
        |      CASE WHEN u < (rate - floor(rate)) * 1152921504606846976.0
        |           THEN 1 ELSE 0 END AS copies
        |  FROM d)
        |SELECT doc_id, source,
        |  unnest(range(1, copies + 1)) AS mix_epoch
        |FROM c""".stripMargin,
    // Same md5-draw replay as t_mixture, with the budget computed as
    // the geometric mean floor(sqrt(t * min(t))) — integer product,
    // IEEE-exact sqrt, no cross-source float sum (see tMixtureTemp).
    "t_mixture_temp" ->
      """WITH tot AS (SELECT source, sum(n_chars) AS t
        |  FROM documents GROUP BY 1),
        |r AS (SELECT source, t,
        |    CAST(floor(sqrt(CAST(t * (SELECT min(t) FROM tot) AS DOUBLE)))
        |      AS BIGINT) AS b
        |  FROM tot),
        |rr AS (SELECT source, CAST(b AS DOUBLE) / CAST(t AS DOUBLE)
        |    AS rate
        |  FROM r WHERE t > 0),
        |d AS (SELECT doc_id, dd.source, rate,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
        |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '1337')), 1, 15))
        |      AS UBIGINT) AS DOUBLE) AS u
        |  FROM documents dd JOIN rr ON dd.source = rr.source),
        |c AS (SELECT doc_id, source,
        |    CAST(floor(rate) AS BIGINT) +
        |      CASE WHEN u < (rate - floor(rate)) * 1152921504606846976.0
        |           THEN 1 ELSE 0 END AS copies
        |  FROM d)
        |SELECT doc_id, source,
        |  unnest(range(1, copies + 1)) AS mix_epoch
        |FROM c""".stripMargin,
    // Span-dedup replication: t_chunk's substr windows at step = size
    // (no overlap), first occurrence by (doc_id, idx) per span md5,
    // reassembly as the ordered concat of surviving spans. A doc whose
    // every span is a later duplicate keeps md5('') — coalesce matches
    // the engine's empty concat_ws.
    "t_span_dedup" ->
      """WITH c AS (SELECT doc_id, coalesce(text, '') AS t,
        |    greatest(1, 1 + CAST(ceil((len(coalesce(text, '')) - 200)
        |      / 200.0) AS INT)) AS n
        |  FROM documents),
        |ch AS (SELECT doc_id, CAST(i AS INT) AS idx,
        |    substr(t, CAST(i * 200 AS INT) + 1, 200) AS chunk
        |  FROM c, LATERAL (SELECT unnest(range(0, n)) AS i) r),
        |mk AS (SELECT doc_id, idx, chunk,
        |    row_number() OVER (PARTITION BY md5(chunk)
        |      ORDER BY doc_id, idx) AS rn
        |  FROM ch)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE rn = 1) AS INT) AS n_kept,
        |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ''
        |    ORDER BY idx), '')) AS clean_md5
        |FROM mk GROUP BY doc_id""".stripMargin,
    // Mutual-kNN edges: brute-force ranks both directions; an (a < b)
    // edge survives iff each endpoint ranks the other within top-10.
    // Same det6 cosine and (cosine DESC, cand_id) tie-break as
    // sim_topk's oracle. Shared with the exhaustive-IVF twin.
    "sim_knn_mutual" -> simKnnMutualOracle,
    "sim_knn_mutual_ivf" -> simKnnMutualOracle,
    "t_leakage_split" ->
      s"""$clusterCte,
         |cl AS (SELECT d.doc_id,
         |    coalesce((SELECT min(r) FROM reach WHERE reach.id = d.doc_id),
         |             d.doc_id) AS cluster_id
         |  FROM documents d),
         |draw AS (SELECT doc_id, cluster_id,
         |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
         |      coalesce(CAST(cluster_id AS VARCHAR), chr(1)), '42')),
         |      1, 15)) AS UBIGINT) AS DOUBLE) AS h
         |  FROM cl)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN h < 0.8 * 1152921504606846976.0 THEN 'train'
         |       WHEN h < 0.9 * 1152921504606846976.0 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM draw""".stripMargin,
    // Keep-set = canonical (minimum-id) member of each closure cluster.
    "dedup_pipeline_keep" ->
      s"""$clusterCte
         |SELECT d.doc_id FROM documents d
         |WHERE coalesce((SELECT min(r) FROM reach WHERE reach.id = d.doc_id),
         |               d.doc_id) = d.doc_id""".stripMargin,
    "t_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS item FROM documents),
         |tot AS (SELECT count(*) AS n_tot FROM tok)
         |SELECT item, count(*) AS n
         |FROM tok CROSS JOIN tot
         |GROUP BY item, tot.n_tot
         |HAVING count(*) * 50 > tot.n_tot
         |ORDER BY n DESC, item""".stripMargin,
    "t_k_anon" ->
      """WITH q AS (SELECT doc_id, lang, source,
        |    n_chars // 100 AS size_b FROM documents),
        |c0 AS (SELECT lang, source, size_b, count(*) AS n0
        |       FROM q GROUP BY 1, 2, 3),
        |j0 AS (SELECT q.*, c0.n0 FROM q
        |       JOIN c0 USING (lang, source, size_b)),
        |c1 AS (SELECT lang, source, count(*) AS n1 FROM j0
        |       WHERE n0 < 5 GROUP BY 1, 2)
        |SELECT j0.doc_id,
        |  CASE WHEN j0.n0 >= 5 THEN 0
        |       WHEN c1.n1 >= 5 THEN 1 ELSE 2 END AS level,
        |  CASE WHEN j0.n0 >= 5 OR c1.n1 >= 5 THEN j0.lang END AS lang_out,
        |  CASE WHEN j0.n0 >= 5 OR c1.n1 >= 5 THEN j0.source END
        |    AS source_out,
        |  CASE WHEN j0.n0 >= 5 THEN j0.size_b END AS size_out
        |FROM j0 LEFT JOIN c1 USING (lang, source)""".stripMargin,
    "t_token_stats" ->
      s"""WITH toks AS (SELECT doc_id, text, $toksSql AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(t) AS INT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS INT) AS n_distinct_tokens,
         |  CAST(len(regexp_extract_all(lower(text),
         |    ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS INT) AS n_bpeish_tokens,
         |  md5(array_to_string(t, ' ')) AS fingerprint
         |FROM toks""".stripMargin,
    "t_lang_id" -> langCase,
    "t_split" ->
      """WITH draw AS (SELECT doc_id,
        |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
        |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '42')),
        |      1, 15)) AS UBIGINT) AS DOUBLE) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN h < 0.8 * 1152921504606846976.0 THEN 'train'
        |       WHEN h < 0.9 * 1152921504606846976.0 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM draw""".stripMargin,
    "t_shuffle_rank" ->
      """SELECT doc_id,
        |  row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'shuf'), doc_id) AS pos
        |FROM documents""".stripMargin,
    "t_vocab" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents)
         |SELECT token, count(*) AS n FROM tok
         |GROUP BY 1 ORDER BY n DESC, token LIMIT 100""".stripMargin,
    "t_seq_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  cum - n_tokens AS start_token,
         |  (cum - n_tokens) // 512 AS pack_first,
         |  CASE WHEN n_tokens > 0 THEN (cum - 1) // 512
         |       ELSE (cum - n_tokens) // 512 END AS pack_last
         |FROM c""".stripMargin,
    "t_bpe_tokens" ->
      s"""WITH RECURSIVE $bpeEncCte,
         |docs AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w2 AS (SELECT doc_id, unnest(t) AS w FROM docs),
         |per_doc AS (SELECT w2.doc_id, CAST(sum(wc.n) AS BIGINT) AS n_bpe
         |  FROM w2 JOIN wc ON w2.w = wc.w GROUP BY 1)
         |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_words,
         |  coalesce(p.n_bpe, 0) AS n_bpe_tokens,
         |  CASE WHEN len(d.t) = 0 THEN ''
         |       ELSE replace(trim(dn.s, '|'), '|', ' ') END AS head_enc
         |FROM docs d
         |LEFT JOIN per_doc p ON d.doc_id = p.doc_id
         |LEFT JOIN done dn ON dn.w = d.t[1]""".stripMargin,
    "t_seq_pack_bpe" ->
      s"""WITH RECURSIVE $bpeEncCte,
         |docs AS (SELECT doc_id, $toksSql AS t FROM documents),
         |w2 AS (SELECT doc_id, unnest(t) AS w FROM docs),
         |tt AS (SELECT d.doc_id, coalesce(p.n_bpe, 0) AS n_tokens
         |  FROM docs d LEFT JOIN (
         |    SELECT w2.doc_id, CAST(sum(wc.n) AS BIGINT) AS n_bpe
         |    FROM w2 JOIN wc ON w2.w = wc.w GROUP BY 1) p
         |  ON d.doc_id = p.doc_id),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM tt)
         |SELECT doc_id, n_tokens,
         |  cum - n_tokens AS start_token,
         |  (cum - n_tokens) // 512 AS pack_first,
         |  CASE WHEN n_tokens > 0 THEN (cum - 1) // 512
         |       ELSE (cum - n_tokens) // 512 END AS pack_last
         |FROM c""".stripMargin,
    "t_quality" ->
      s"""WITH toks AS (SELECT doc_id, text, $toksSql AS t FROM documents),
         |m AS (SELECT doc_id, text, t,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE)
         |      / length(text) ELSE 0.0 END AS pr,
         |  CASE WHEN len(t) > 0 THEN
         |    CAST(len(list_filter(t, x -> list_contains(${allStopsSql}, x))) AS DOUBLE) / len(t)
         |    ELSE 0.0 END AS sr,
         |  CASE WHEN len(t) > 0 THEN
         |    CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
         |    ELSE 0.0 END AS mtl
         |  FROM toks)
         |SELECT doc_id,
         |  CAST(length(text) AS INT) AS n_chars_m,
         |  floor(pr * 1000000 + 0.5) / 1000000 AS punct_ratio,
         |  floor(sr * 1000000 + 0.5) / 1000000 AS stopword_ratio,
         |  floor(mtl * 1000000 + 0.5) / 1000000 AS mean_token_len,
         |  floor((least(CAST(len(t) AS DOUBLE) / 50.0, 1.0) * 0.5
         |    + (1.0 - pr) * 0.3
         |    + least(mtl / 8.0, 1.0) * 0.2) * 1000000 + 0.5) / 1000000 AS quality
         |FROM m""".stripMargin,
    // mm_features pins the shape contract (every media row comes back
    // with the fixed 8x8 grid and 64 unpacked tensor values under its
    // original id); mm_decode below pins the decoded PIXELS.
    "mm_frames" ->
      """WITH v AS (SELECT doc_id AS media_id,
        |    CAST(n_chars % 200 + 1 AS INT) AS n_frames
        |  FROM documents)
        |SELECT media_id, n_frames,
        |  CAST(unnest(CASE WHEN n_frames <= 8 THEN range(0, n_frames)
        |    ELSE list_transform(range(0, 8), i -> i * n_frames // 8)
        |    END) AS INT) AS frame_idx
        |FROM v""".stripMargin,
    "mm_features" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(8 AS INT) AS shape_h, CAST(8 AS INT) AS shape_w,
        |  CAST(64 AS INT) AS n_values
        |FROM documents""".stripMargin,
    "dedup_fuzzy" ->
      s"""$fuzzyPairsCte
         |SELECT id_a, id_b, shared, dist FROM fpairs""".stripMargin,

    // Closed-form replay of the PCM sample formula + 256-sample frame
    // energies; the Spark side must survive the WAV encode→parse round
    // trip bit-exactly for Σs² to hash-match.
    "mm_audio" ->
      """WITH p AS (SELECT doc_id, 800 + (doc_id % 5) * 100 AS ns
        |  FROM documents WHERE doc_id < 64),
        |s AS (SELECT doc_id, i,
        |    ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
        |  FROM p, LATERAL (SELECT unnest(range(0, ns)) AS i) r),
        |f AS (SELECT doc_id, CAST(i // 256 AS INT) AS frame_idx,
        |    count(*) AS n, sum(v * v) AS sumsq
        |  FROM s GROUP BY 1, 2)
        |SELECT doc_id, frame_idx, CAST(n AS INT) AS n,
        |  CAST(sumsq AS BIGINT) AS sumsq,
        |  floor(sqrt(CAST(sumsq AS DOUBLE) / n) * 1000000 + 0.5)
        |    / 1000000 AS rms
        |FROM f""".stripMargin,
    // Replays the deterministic raster formula (dims + pixel values) in
    // closed form: the Spark side must DECODE the lossless PNG back to
    // exactly these pixels for the sums to hash-match.
    "mm_decode" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |    16 + doc_id % 17 AS w, 12 + doc_id % 11 AS h
        |  FROM documents WHERE doc_id % 8 = 0),
        |px AS (SELECT media_id, w, h,
        |    (media_id * 31 + xs.x * 7 + ys.y * 13) % 256 AS g
        |  FROM ids,
        |    LATERAL (SELECT unnest(range(0, w)) AS x) xs,
        |    LATERAL (SELECT unnest(range(0, h)) AS y) ys)
        |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(sum(g) AS BIGINT) AS px_sum
        |FROM px GROUP BY 1, 2, 3""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_jaccard" -> jaccardOracle,
    "dedup_jaccard_capped" -> cappedJaccardOracle,
    "dedup_minhash" -> jaccardOracle,
    // Full SimHash replication: the fingerprint's token hash is md5's
    // first 8 bytes (see Dedup.simhash64Fn), so DuckDB rebuilds the
    // exact 64-bit fingerprints and checks ALL hamming<=3 pairs — the
    // Spark side's 16-bit-chunk banding is exhaustive for hamming<=3
    // (pigeonhole), so the sets must be identical.
    "dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |th AS (SELECT doc_id,
         |    CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
         |  FROM tok),
         |bits AS (SELECT doc_id, b,
         |    SUM(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM th CROSS JOIN range(64) r(b) GROUP BY 1, 2),
         |fp0 AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN v > 0
         |      THEN (CAST(1 AS UBIGINT) << CAST(b AS INT))
         |      ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS f
         |  FROM bits GROUP BY 1),
         |fp AS (SELECT d.doc_id, coalesce(fp0.f, CAST(0 AS UBIGINT)) AS f
         |  FROM documents d LEFT JOIN fp0 ON d.doc_id = fp0.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.f, b.f)) <= 3""".stripMargin,
    "sim_lsh_topk" -> lshOracle,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
        |      (x, y) -> x + y)
        |    / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))
        |     * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)))
        |    AS c
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, floor(c * 1000000 + 0.5) / 1000000 AS cosine
        |FROM p
        |WHERE floor(c * 1000000 + 0.5) / 1000000 >= 0.45""".stripMargin,
    // The embedding pair predicate (exact cosine >= 0.45 at 6dp, the
    // dedup_embedding oracle) closed transitively; survivors = minimum
    // member of each closure cluster, singletons keep themselves.
    "dedup_semantic_keep" ->
      """WITH RECURSIVE e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]),
        |      (x, y) -> x + y)
        |    / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))
        |     * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)))
        |    AS c
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |pairs AS (SELECT id_a, id_b FROM p
        |  WHERE floor(c * 1000000 + 0.5) / 1000000 >= 0.45),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT edges.dst AS id, reach.r
        |  FROM reach JOIN edges ON reach.id = edges.src)
        |SELECT emb.vec_id FROM embeddings emb
        |WHERE coalesce((SELECT min(r) FROM reach
        |                WHERE reach.id = emb.vec_id), emb.vec_id)
        |      = emb.vec_id""".stripMargin,
    "sim_ivf_topk" -> simTopKOracle,
    "sim_topk" -> simTopKOracle,
    "sim_quant_topk" -> quantTopKOracle,
    "sim_ivf_quant" -> quantTopKOracle,
    "sim_ivf_at_rest" -> quantTopKOracle,
    "sim_ivf_upsert" -> ivfUpsertOracle,
    "st_index_upsert" -> ivfUpsertOracle,
    "t_bm25" -> bm25Oracle,
    "t_contamination" -> contaminationOracle,
    "t_redact" -> redactOracle,
    "t_repetition" -> repetitionOracle,
    "t_surprisal" -> surprisalOracle,
    "t_surprisal2" -> surprisal2Oracle,
    "t_pipeline_e2e" -> pipelineE2eOracle,
    // Chunking replication: same count formula and substr windows
    // (both engines index characters 1-based; step = 160).
    "t_chunk" ->
      """WITH c AS (SELECT doc_id, text, coalesce(text, '') AS t,
        |    greatest(1, 1 + CAST(ceil((len(coalesce(text, '')) - 200)
        |      / 160.0) AS INT)) AS n
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  CAST(i * 160 AS INT) AS chunk_start,
        |  CAST(len(substr(t, i * 160 + 1, 200)) AS INT) AS chunk_len,
        |  md5(substr(t, i * 160 + 1, 200)) AS chunk_md5
        |FROM c, LATERAL (SELECT unnest(range(0, n)) AS i) r""".stripMargin,
    "t_gopher_filter" -> gopherFilterOracle,
    "t_tfidf_terms" ->
      s"""WITH tok AS (SELECT source, unnest(t) AS term
         |  FROM (SELECT source, $toksSql AS t FROM documents)),
         |tf AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfx AS (SELECT term, count(DISTINCT source) AS df
         |  FROM tok GROUP BY 1),
         |n AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS ns
         |  FROM documents),
         |sc AS (SELECT source, tf.term AS term,
         |    floor(tf * ln((ns + 1.0) / (df + 1.0)) * 1000000 + 0.5)
         |      / 1000000 AS tfidf
         |  FROM tf JOIN dfx ON tf.term = dfx.term, n)
         |SELECT source, term, tfidf, CAST(rank AS INT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY tfidf DESC, term) AS rank FROM sc)
         |WHERE rank <= 5""".stripMargin,
    "t_curriculum" -> curriculumOracle)

  /** Bigram-surprisal replication: both model tables rebuilt with the
    * same top-200000 (count desc, key asc) caps, p = c(bigram)/c(prefix)
    * with the prefix looked up via split_part (tokens carry no spaces),
    * per-doc contributions folded in sorted bigram order — the
    * surprisalOracle conventions one n up. */
  private lazy val surprisal2Oracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |w AS (SELECT doc_id, unnest(t) AS w FROM toks),
       |uniall AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
       |uni AS (SELECT w, c FROM uniall ORDER BY c DESC, w LIMIT 200000),
       |bg AS (SELECT doc_id, unnest(list_transform(
       |    range(1, greatest(len(t), 1)),
       |    i -> t[i] || ' ' || t[i+1])) AS b
       |  FROM toks WHERE len(t) >= 2),
       |biall AS (SELECT b, count(*) AS c FROM bg GROUP BY 1),
       |bi AS (SELECT b, c FROM biall ORDER BY c DESC, b LIMIT 200000),
       |db AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
       |contrib AS (SELECT db.doc_id, db.b,
       |    db.n * ln(bi.c * 1.0 / uni.c) AS v
       |  FROM db JOIN bi ON db.b = bi.b
       |  JOIN uni ON split_part(db.b, ' ', 1) = uni.w),
       |folded AS (SELECT doc_id,
       |    list_reduce(list(v ORDER BY b), (a, x) -> a + x) AS sv
       |  FROM contrib GROUP BY 1),
       |cnt AS (SELECT doc_id, len(t) AS nt FROM toks)
       |SELECT d.doc_id,
       |  coalesce(floor(-sv / (nt - 1) * 1000000 + 0.5) / 1000000, 0.0)
       |    AS surprisal2
       |FROM documents d
       |LEFT JOIN folded f ON d.doc_id = f.doc_id
       |LEFT JOIN cnt ON d.doc_id = cnt.doc_id""".stripMargin

  /** Whole-pipeline replication: each stage's existing oracle embedded
    * as a subquery (scoped WITHs — the recursive dedup closure, the
    * Gopher bundle, the contamination shingle join), then the survivor
    * join, the t_seq_pack window cumsum, and the t_split draw.
    * Substitution happens AFTER stripMargin: the embedded oracles
    * contain `||` continuation lines that stripMargin would mangle. */
  private lazy val pipelineE2eOracle: String =
    s"""WITH keepg AS (SELECT doc_id FROM (__GOPHER__) g
       |  WHERE g.keep),
       |dk AS (SELECT doc_id FROM (__CLUSTER__
       |  SELECT d.doc_id FROM documents d
       |  WHERE coalesce((SELECT min(r) FROM reach WHERE reach.id = d.doc_id),
       |                 d.doc_id) = d.doc_id) k),
       |contam AS (SELECT DISTINCT corpus_id AS doc_id
       |  FROM (__CONTAM__) cc),
       |surv AS (SELECT d.doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents d
       |  JOIN keepg USING (doc_id) JOIN dk USING (doc_id)
       |  WHERE d.source <> 'src0'
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)),
       |c AS (SELECT doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM surv),
       |draw AS (SELECT doc_id, n_tokens, cum,
       |    CAST(CAST(('0x' || substr(md5(concat_ws(':',
       |      coalesce(CAST(doc_id AS VARCHAR), chr(1)), '42')),
       |      1, 15)) AS UBIGINT) AS DOUBLE) AS h
       |  FROM c)
       |SELECT doc_id, n_tokens, cum - n_tokens AS start_token,
       |  (cum - n_tokens) // 512 AS pack_first,
       |  CASE WHEN h < 0.8 * 1152921504606846976.0 THEN 'train'
       |       WHEN h < 0.9 * 1152921504606846976.0 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM draw""".stripMargin
      .replace("__GOPHER__", gopherFilterOracle)
      .replace("__CLUSTER__", clusterCte)
      .replace("__CONTAM__", contaminationOracle)

  /** Gopher-bundle replication: word stats + the 32-marker stop list
    * inline, repetition fracs composed from the repetitionOracle as a
    * subquery (same 6dp pins), rules as the same boolean expressions.
    * Null-text parity: the kernels return 0.0/0 for null text (the
    * repetition-kernel convention), so mean_word_len and n_stopwords
    * coalesce the NULL the SQL token pipeline produces — n_words stays
    * NULL on both sides (tokenCount's size(null) contract). */
  private lazy val gopherFilterOracle: String = {
    val stops = graft.ext.TextFunctions.langMarkers.flatMap(_._2)
      .map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |m AS (SELECT doc_id, CAST(len(t) AS INT) AS n_words,
       |    coalesce(floor((CASE WHEN len(t) = 0 THEN 0.0
       |      ELSE CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
       |        / len(t) END) * 1000000 + 0.5) / 1000000, 0.0)
       |      AS mean_word_len,
       |    coalesce(CAST(len(list_distinct(list_filter(t,
       |      x -> list_contains([$stops], x)))) AS INT), 0) AS n_stopwords
       |  FROM toks)
       |SELECT m.doc_id, n_words, mean_word_len, n_stopwords,
       |  dup_trigram_frac, top_bigram_frac,
       |  n_words BETWEEN 50 AND 100000 AS r_word_count,
       |  mean_word_len BETWEEN 3.0 AND 10.0 AS r_word_len,
       |  n_stopwords >= 1 AS r_stopwords,
       |  (dup_trigram_frac <= 0.2 AND top_bigram_frac <= 0.18)
       |    AS r_repetition,
       |  (n_words BETWEEN 50 AND 100000
       |    AND mean_word_len BETWEEN 3.0 AND 10.0
       |    AND n_stopwords >= 1
       |    AND dup_trigram_frac <= 0.2 AND top_bigram_frac <= 0.18)
       |    AS keep
       |FROM m JOIN ($repetitionOracle) rep ON m.doc_id = rep.doc_id""".stripMargin
  }

  /** Surprisal replication: corpus unigram frequencies in SQL, per-doc
    * per-distinct-token contributions folded via `list(v ORDER BY tok)`
    * + list_reduce — the same sorted-order IEEE fold as the kernel's
    * TreeMap walk (tokens are [a-z0-9]+, so UTF-16 and binary UTF-8
    * orders coincide). The model is capped at the top-200000 tokens by
    * (count desc, token asc) exactly as Retrieval.surprisal's default
    * bound — a no-op at fixture vocab sizes, but it pins the bounded
    * semantics engine-independently; the normalizer `tot` stays the
    * FULL corpus token count. ntoks counts ALL tokens (the kernel
    * divides by toks.length), not just in-vocabulary ones. */
  private lazy val surprisalOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
       |freqall AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freqall),
       |freq AS (SELECT tok, c FROM freqall
       |  ORDER BY c DESC, tok LIMIT 200000),
       |cnt AS (SELECT doc_id, count(*) AS ntoks FROM tok GROUP BY 1),
       |dt AS (SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY 1, 2),
       |contrib AS (SELECT dt.doc_id, dt.tok,
       |    dt.n * ln(freq.c * 1.0 / (SELECT t FROM tot)) AS v
       |  FROM dt JOIN freq ON dt.tok = freq.tok),
       |folded AS (SELECT doc_id,
       |    list_reduce(list(v ORDER BY tok), (a, b) -> a + b) AS sv
       |  FROM contrib GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(floor(-sv / ntoks * 1000000 + 0.5) / 1000000, 0.0)
       |    AS surprisal
       |FROM documents d
       |LEFT JOIN folded f ON d.doc_id = f.doc_id
       |LEFT JOIN cnt ON d.doc_id = cnt.doc_id""".stripMargin

  /** Whole-chain curriculum replication: the t_quality score CTE →
    * the op_bucketize CASE (last edge +1e-9) → the op_balanced_sample
    * per-bucket threshold + md5 draw, all double-for-double. */
  private lazy val curriculumOracle: String =
    s"""WITH toks AS (SELECT doc_id, text, $toksSql AS t FROM documents),
       |m AS (SELECT doc_id, text, t,
       |  CASE WHEN length(text) > 0 THEN
       |    CAST(length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS DOUBLE)
       |      / length(text) ELSE 0.0 END AS pr,
       |  CASE WHEN len(t) > 0 THEN
       |    CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
       |    ELSE 0.0 END AS mtl
       |  FROM toks),
       |q AS (SELECT doc_id,
       |  floor((least(CAST(len(t) AS DOUBLE) / 50.0, 1.0) * 0.5
       |    + (1.0 - pr) * 0.3
       |    + least(mtl / 8.0, 1.0) * 0.2) * 1000000 + 0.5) / 1000000 AS q
       |  FROM m),
       |b AS (SELECT doc_id, CASE
       |    WHEN q >= 0.0 AND q < 0.2 THEN 0
       |    WHEN q >= 0.2 AND q < 0.4 THEN 1
       |    WHEN q >= 0.4 AND q < 0.6 THEN 2
       |    WHEN q >= 0.6 AND q < 0.8 THEN 3
       |    WHEN q >= 0.8 AND q < 1.000000001 THEN 4
       |    ELSE -1 END AS bucket
       |  FROM q),
       |c AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
       |tgt AS (SELECT least(min(cnt), 40) AS target FROM c),
       |thr AS (SELECT bucket,
       |    least(1.0, (SELECT target FROM tgt) * 1.0 / cnt)
       |      * 1152921504606846976.0 AS thr
       |  FROM c)
       |SELECT b.doc_id, b.bucket
       |FROM b JOIN thr ON b.bucket = thr.bucket
       |WHERE CAST(CAST(('0x' || substr(md5(concat_ws(':',
       |    coalesce(CAST(b.doc_id AS VARCHAR), chr(1)), '1337')),
       |    1, 15)) AS UBIGINT) AS DOUBLE) < thr.thr""".stripMargin

  /** Repetition-signal replication: occurrence-counted (NOT distinct)
    * trigram/bigram grams per doc; dup fraction and top fraction with
    * the same divide-then-round structure as the kernels. Docs too
    * short for the gram default to 0.0 via the LEFT JOINs. */
  private lazy val repetitionOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |tri AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, greatest(len(t) - 1, 1)),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
       |  FROM toks WHERE len(t) >= 3),
       |tc AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
       |tstat AS (SELECT doc_id,
       |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, sum(c) AS tot
       |  FROM tc GROUP BY 1),
       |bi AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, greatest(len(t), 1)),
       |    i -> t[i] || ' ' || t[i+1])) AS g
       |  FROM toks WHERE len(t) >= 2),
       |bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
       |bstat AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot
       |  FROM bc GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(floor(CAST(ts.dup AS DOUBLE) / CAST(ts.tot AS DOUBLE)
       |    * 1000000 + 0.5) / 1000000, 0.0) AS dup_trigram_frac,
       |  coalesce(floor(CAST(bs.mx AS DOUBLE) / CAST(bs.tot AS DOUBLE)
       |    * 1000000 + 0.5) / 1000000, 0.0) AS top_bigram_frac
       |FROM documents d
       |LEFT JOIN tstat ts ON d.doc_id = ts.doc_id
       |LEFT JOIN bstat bs ON d.doc_id = bs.doc_id""".stripMargin

  /** BM25 replication: tf/df/N/dl recomputed in SQL (SF-independent),
    * constants written as the same source-literal arithmetic the Scala
    * side evaluates ((1.2 + 1.0), (1.0 - 0.75)) so both engines derive
    * identical doubles, ln within 1 ulp on both, 6dp rounding before
    * the (score desc, id) ranking. Term contributions added
    * left-to-right in [[Bm25Terms]] order, mirroring `reduceLeft`. */
  private lazy val bm25Oracle: String = {
    def tf(t: String) = s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE)"
    def df(t: String) =
      s"(SELECT CAST(count(*) AS DOUBLE) FROM toks WHERE list_contains(t, '$t'))"
    val n = "(SELECT CAST(count(*) AS DOUBLE) FROM toks)"
    val avgdl = s"((SELECT sum(CAST(len(t) AS DOUBLE)) FROM toks) / $n)"
    val terms = Bm25Terms.map { t =>
      val dft = df(t); val tft = tf(t)
      s"""ln(($n - $dft + 0.5) / ($dft + 0.5) + 1.0)
         |    * ($tft * (1.2 + 1.0))
         |    / ($tft + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / $avgdl)))"""
        .stripMargin
    }
    val score = terms.mkString("(", "\n  + ", ")")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |d AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM toks)
       |SELECT doc_id,
       |  floor($score * 1000000 + 0.5) / 1000000 AS bm25
       |FROM d
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Contamination replication: distinct 8-token shingles per doc (the
    * shinglesOfText kernel), bucket-join bench (src0) × rest. */
  private lazy val contaminationOracle: String =
    s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, source, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(t) - 6, 1)),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
       |      || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
       |      || ' ' || t[i+7]))) AS s
       |  FROM toks WHERE len(t) >= 8)
       |SELECT b.doc_id AS bench_id, c.doc_id AS corpus_id,
       |  CAST(count(*) AS INT) AS n_shared
       |FROM sh c JOIN sh b ON b.s = c.s
       |WHERE b.source = 'src0' AND c.source <> 'src0'
       |GROUP BY 1, 2""".stripMargin

  /** Redaction replication: identical PII synthesis, identical RE2 ∩
    * java.util.regex patterns; DuckDB regexp_replace needs the 'g'
    * flag to match Spark's replace-all semantics. */
  private[queries] lazy val redactOracle: String = {
    val email = Redaction.EmailRe
    val phone = Redaction.PhoneRe
    s"""WITH pii AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com'
       |      || CASE WHEN doc_id % 3 = 0
       |           THEN ' or call +1-555-'
       |             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |           ELSE '' END AS p
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(p, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(p, '$phone')) AS INT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(p,
       |    '$email', '[EMAIL]', 'g'), '$phone', '[PHONE]', 'g'))
       |    AS redacted_hash
       |FROM pii""".stripMargin
  }

  /** quantTopKOracle restructured over the POST-CDC corpus: frozen base
    * scale, deletes removed, updates reversed, inserts present; query
    * vectors stay the ORIGINAL embeddings (vec_id < 20). Shared by the
    * one-shot (sim_ivf_upsert) and streaming (st_index_upsert) entries
    * — both converge the index to the same state. */
  private lazy val ivfUpsertOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s
      |  FROM e WHERE vec_id % 5 <> 4 AND v IS NOT NULL AND len(v) > 0),
      |corpus AS (SELECT vec_id,
      |    CASE WHEN vec_id % 5 <> 4 AND vec_id % 13 <> 0
      |              AND vec_id % 7 = 0
      |         THEN list_reverse(v) ELSE v END AS v
      |  FROM e
      |  WHERE NOT (vec_id % 5 <> 4 AND vec_id % 13 = 0)),
      |qzc AS (SELECT vec_id, list_transform(v,
      |      x -> CAST(greatest(-127, least(127,
      |        floor(x / s * 127 + 0.5))) AS BIGINT)) AS q
      |  FROM corpus, sc),
      |qzq AS (SELECT vec_id, list_transform(v,
      |      x -> CAST(greatest(-127, least(127,
      |        floor(x / s * 127 + 0.5))) AS BIGINT)) AS q
      |  FROM e, sc WHERE vec_id < 20),
      |nc AS (SELECT vec_id, q,
      |    list_reduce(list_transform(q, x -> x * x), (a, b) -> a + b)
      |      AS nn
      |  FROM qzc),
      |nq AS (SELECT vec_id, q,
      |    list_reduce(list_transform(q, x -> x * x), (a, b) -> a + b)
      |      AS nn
      |  FROM qzq),
      |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
      |    floor(CAST(list_reduce(
      |        list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]),
      |        (x, y) -> x + y) AS DOUBLE)
      |      / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE)))
      |      * 1000000 + 0.5) / 1000000 AS qcosine
      |  FROM (SELECT * FROM nq WHERE nn > 0) a
      |  JOIN (SELECT * FROM nc WHERE nn > 0) b
      |    ON b.vec_id <> a.vec_id),
      |ranked AS (SELECT query_id, cand_id, qcosine,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY qcosine DESC, cand_id) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, cand_id, qcosine, rank FROM ranked
      |WHERE rank <= 10""".stripMargin

  /** Quantized-cosine replication: int8 quantization (q = floor(x/s*127
    * + 0.5), global symmetric scale from the corpus max |component|),
    * EXACT integer dot/norms, float division + 6dp round at the end. */
  private lazy val quantTopKOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s
      |  FROM e WHERE v IS NOT NULL AND len(v) > 0),
      |qz AS (SELECT vec_id,
      |    list_transform(v,
      |      x -> CAST(floor(x / s * 127 + 0.5) AS BIGINT)) AS q
      |  FROM e, sc),
      |n AS (SELECT vec_id, q,
      |    list_reduce(list_transform(q, x -> x * x), (a, b) -> a + b) AS nn
      |  FROM qz),
      |nz AS (SELECT * FROM n WHERE nn > 0),
      |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
      |    floor(CAST(list_reduce(
      |        list_transform(list_zip(a.q, b.q), z -> z[1] * z[2]),
      |        (x, y) -> x + y) AS DOUBLE)
      |      / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE)))
      |      * 1000000 + 0.5) / 1000000 AS qcosine
      |  FROM nz a JOIN nz b ON a.vec_id < 20 AND b.vec_id <> a.vec_id),
      |ranked AS (SELECT query_id, cand_id, qcosine,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY qcosine DESC, cand_id) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, cand_id, qcosine, rank FROM ranked
      |WHERE rank <= 10""".stripMargin

  // Exhaustive top-k oracle — shared by sim_topk (brute force) and
  // sim_ivf_topk (full-probe IVF, provably the same result set).
  // lazy: referenced from `oracles`, which initializes first.
  private lazy val simTopKOracle =
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 20),
        |scored AS (SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
        |    floor(
        |      list_reduce(list_transform(list_zip(q.v, e.v), z -> z[1] * z[2]),
        |        (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
        |       * sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y)))
        |      * 1000000 + 0.5) / 1000000 AS cosine
        |  FROM q JOIN e ON q.vec_id <> e.vec_id),
        |ranked AS (SELECT query_id, cand_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, cand_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin

  private def allStopsSql: String =
    TF.langMarkers.flatMap(_._2).distinct
      .map(m => s"'$m'").mkString("[", ", ", "]")

  /** Full LSH replication for sim_lsh_topk: the deterministic hyperplane
    * components (SimilaritySearch.planeVector — splitmix64 of (table,
    * plane, dim), no RNG state) are inlined as SQL literals, so DuckDB
    * computes the same sign-bit buckets, the same candidate union across
    * tables, and the same exact-cosine re-rank. Shortest-round-trip
    * Double.toString guarantees DuckDB parses bit-identical doubles;
    * both engines accumulate dot products in ascending index order.
    * dim=64 matches the driver's embeddings fixture (all SFs). */
  private lazy val lshOracle: String = {
    val numPlanes = 12; val numTables = 4; val dim = 64
    val rows = (for {
      t <- 0 until numTables
      p <- 0 until numPlanes
    } yield {
      val comps = SimilaritySearch.planeVector(t, p, dim)
        .map(java.lang.Double.toString).mkString("[", ", ", "]")
      s"($t, $p, CAST($comps AS DOUBLE[]))"
    }).mkString(",\n    ")
    s"""WITH planes(tbl, plane, pv) AS (VALUES
       |    $rows),
       |e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |buck AS (
       |  SELECT e.vec_id, p.tbl,
       |    CAST(SUM(CASE WHEN list_reduce(
       |        list_transform(list_zip(e.v, p.pv), z -> z[1] * z[2]),
       |        (x, y) -> x + y) >= 0
       |      THEN (CAST(1 AS UBIGINT) << CAST(p.plane AS INT))
       |      ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
       |  FROM buck q JOIN buck c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |scored AS (SELECT cand.query_id, cand.cand_id,
       |    floor(
       |      list_reduce(list_transform(list_zip(q.v, c.v), z -> z[1] * z[2]),
       |        (x, y) -> x + y)
       |      / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
       |       * sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y)))
       |      * 1000000 + 0.5) / 1000000 AS cosine
       |  FROM cand
       |  JOIN e q ON cand.query_id = q.vec_id
       |  JOIN e c ON cand.cand_id = c.vec_id),
       |ranked AS (SELECT query_id, cand_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= 10""".stripMargin
  }
}
