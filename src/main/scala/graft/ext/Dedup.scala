package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import TextFunctions._

/** Deduplication operators for training-data pipelines: exact,
  * exact-jaccard over word shingles, MinHash+LSH near-dup, SimHash,
  * and embedding-cosine near-dup.
  *
  * Scale design (100 TB mandate):
  *   - exact: one hash-groupBy, map-side combined; no data movement
  *     beyond the (hash → count) shuffle.
  *   - exact jaccard: explode shingles → equi-join on shingle →
  *     pair-count aggregation. Cost is Σ |docs sharing a shingle|² —
  *     selective when shingles are discriminative. `maxShingleDf`
  *     drops stop-shingles to bound skew (standard practice; off by
  *     default because the correctness oracle must see the same input).
  *   - MinHash+LSH: fixed-width signature per doc (one pass), band →
  *     equi-join on band key → candidate pairs → exact verify. Shuffle
  *     volume is O(docs × bands), independent of pair count.
  *   - SimHash: 64-bit fingerprint; near-dup candidates via 16-bit
  *     chunk equality (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 chunks equal).
  */
object Dedup {

  /** Exact duplicate groups by content hash; `keep_id` is the canonical
    * (minimum) id per group. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows to keep after exact dedup (minimum id per content hash wins) —
    * window-free formulation: a semi-join against the winners, which
    * stays a hash join at scale instead of a full sort per group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = exactGroups(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Compiled tokenize→shingle UDF: semantically identical to
    * TF.shingles(TF.tokens(c), n) (lowercase, [^a-z0-9]+ split, drop
    * empties, n-gram join with spaces, distinct) but ~10× faster — the
    * Catalyst higher-order array expressions are CodegenFallback and
    * dominate the dedup pipelines when interpreted. */
  private[ext] def shingleFn(n: Int): String => Seq[String] = { text: String =>
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).distinct.toSeq
  }

  /** Exploded (id, shingle) pairs, distinct per doc. */
  private def shingleRows(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      maxShingleDf: Option[Int]): DataFrame = {
    val base = df
      .select(col(idCol).as("__id"),
        explode(udf(shingleFn(n)).apply(col(textCol))).as("__sh"))
    maxShingleDf match {
      case None => base
      case Some(cap) =>
        // Drop stop-shingles with document frequency > cap (skew guard).
        val rare = base.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
          .where(col("__df") <= cap).select(col("__sh"))
        base.join(rare, Seq("__sh"), "left_semi")
    }
  }

  /** Exact n-gram-Jaccard near-duplicate pairs: all (a < b) with
    * |shingles(a) ∩ shingles(b)| / |shingles(a) ∪ shingles(b)| ≥
    * threshold. Output: (id_a, id_b, jaccard). */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3,
      maxShingleDf: Option[Int] = None): DataFrame = {
    // Pre-hash-partition on shingle: parallelizes the explode output of
    // single-partition inputs AND pre-shuffles both sides of the
    // self-join (exchange reuse keeps it to one shuffle).
    val p = df.sparkSession.sparkContext.defaultParallelism
    // localCheckpoint, not cache: blocks are GC-cleaned when the frame
    // is unreferenced, so repeated calls in a long session don't leak
    // executor storage (cache persists until explicit unpersist).
    val sh = shingleRows(
      df.repartition(p), idCol, textCol, n, maxShingleDf)
      .repartition(p, col("__sh")).localCheckpoint()
    val sizes = sh.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val a = sh.select(col("__id").as("id_a"), col("__sh"))
    val b = sh.select(col("__id").as("id_b"), col("__sh"))
    val inter = a.join(b, Seq("__sh"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("jaccard",
        graft.functions.DetRound.det6(col("__inter").cast("double") /
          (col("__na") + col("__nb") - col("__inter"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------- MinHash

  /** Stable 64-bit string hash (murmur-free: splitmix over UTF-8 bytes —
    * deterministic across JVMs and Spark versions). */
  private def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    val bytes = s.getBytes("UTF-8")
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  private def mix(h: Long, seed: Long): Long = {
    var z = h ^ seed
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: sig(i) = min over shingles of mix(hash64(sh), i).
    * One pass over the shingle set per doc, k mins kept in a local
    * array — O(shingles × k) CPU, no extra shuffle. */
  def minhashSignature(numHashes: Int): Seq[String] => Seq[Long] = {
    shs: Seq[String] => {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      shs.foreach { s =>
        val h = hash64(s)
        var i = 0
        while (i < numHashes) {
          val v = mix(h, 0x9E3779B97F4A7C15L * (i + 1))
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig.toSeq
    }
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * bands × rowsPerBand = numHashes. Candidate generation: equal band
    * slice ⇒ candidate; verification joins candidates back to distinct-
    * shingle arrays and computes exact Jaccard via array_intersect /
    * array_union, so the output CONTAINS NO FALSE POSITIVES — only
    * (astronomically unlikely, tunable) false negatives vs `jaccardPairs`.
    * Same output schema as `jaccardPairs`.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigUdf = udf(minhashSignature(numHashes))

    // Repartition RAW rows first: anything computed before the exchange
    // runs on the input's partition count (often 1 small file locally).
    val docs = df
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col("__id"), udf(shingleFn(n)).apply(col("__text")).as("__shs"))
      .where(size(col("__shs")) > 0)
      .withColumn("__sig", sigUdf(col("__shs")))
      .localCheckpoint() // see jaccardPairs: GC-safe, no storage leak

    // band key = (band index, hash of the signature slice)
    val banded = docs.select(col("__id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, slice(col("__sig"),
          b * rowsPerBand + 1, lit(rowsPerBand))))).as(Seq("__band", "__key")))

    val l = banded.select(col("__band"), col("__key"), col("__id").as("id_a"))
    val r = banded.select(col("__band"), col("__key"), col("__id").as("id_b"))
    val candidates = l.join(r, Seq("__band", "__key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val withSets = candidates
      .join(docs.select(col("__id").as("id_a"), col("__shs").as("__sa")), Seq("id_a"))
      .join(docs.select(col("__id").as("id_b"), col("__shs").as("__sb")), Seq("id_b"))
    withSets
      .withColumn("jaccard", graft.functions.DetRound.det6(
        size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          size(array_union(col("__sa"), col("__sb")))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Banded LSH probe rows — one row per (doc, band) with the band key
    * and the doc's shingle set carried alongside: the building block
    * for STREAM-STATIC near-dup screens, where the static corpus index
    * and the arriving docs must band identically (same signature, same
    * `xxhash64("band", i, slice)` key as [[minhashLshPairs]], asserted
    * by spec). Stateless and stream-safe: no checkpoint, no
    * repartition — the batch self-join pipeline keeps its own
    * checkpointed two-phase form in [[minhashLshPairs]]. Carrying the
    * shingle array through the band explode costs bands× duplication
    * in flight (never in state); the alternative — joining back to a
    * second pass over the stream — is a stream-stream join this
    * composition exists to avoid. */
  def bandedProbeRows(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigUdf = udf(minhashSignature(numHashes))
    df.select(col(idCol), udf(shingleFn(n)).apply(col(textCol)).as("__shs"))
      .where(size(col("__shs")) > 0)
      .withColumn("__sig", sigUdf(col("__shs")))
      .select(col(idCol), col("__shs"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(lit("band"), b, slice(col("__sig"),
            b * rowsPerBand + 1, lit(rowsPerBand))))).as(Seq("__band", "__key")))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over tokens: per-token 64-bit hash votes ±1 on every
    * bit, weighted by term frequency; fingerprint bit = sign of vote.
    *
    * The token hash is the FIRST 8 BYTES OF md5 (big-endian) — not the
    * internal FNV/splitmix mix — precisely so any engine with an md5
    * builtin reproduces the fingerprint bit-for-bit: DuckDB's
    * `CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT)` yields the
    * same 64 bits, which is what makes `dedup_simhash` value-checkable
    * against a SQL oracle rather than rows-only. md5 throughput (~500
    * MB/s/core on short tokens) is not the bottleneck of any simhash
    * pipeline stage (the pair join is). */
  // One digest per executor thread, not per row — getInstance pays a
  // JCA provider lookup comparable to the md5 work itself on short docs.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash64Fn: Seq[String] => Long = { toks: Seq[String] =>
    val md = md5Local.get()
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8")) // digest() resets the md
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def withSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize inside the UDF (compiled) rather than via the interpreted
    // higher-order tokens() expression; repartition first so the CPU
    // work spreads across cores for single-file inputs.
    val sh = udf { text: String =>
      simhash64Fn(text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    }
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), sh(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3 for
    * the 4-chunk pigeonhole to be exhaustive). */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is exhaustive only for hamming <= 3")
    val sh = withSimhash(df, idCol, textCol)
    // 4 chunks of 16 bits each as candidate band keys.
    val chunked = sh.select(col(idCol).as("__id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("__chunk", "__key")))
    val l = chunked.select(col("__chunk"), col("__key"),
      col("__id").as("id_a"), col("simhash").as("__ha"))
    val r = chunked.select(col("__chunk"), col("__key"),
      col("__id").as("id_b"), col("simhash").as("__hb"))
    l.join(r, Seq("__chunk", "__key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------- Full pipeline

  /** End-to-end dedup pipeline, composed the way it must run at scale:
    *
    *   1. EXACT dedup first — duplicate-heavy corpora (the common case
    *      for web-scale training data) multiply every shingle's document
    *      frequency by the copy count, which blows the near-dup join up
    *      QUADRATICALLY (Σ df² cost). Collapsing exact copies first
    *      bounds that: near-dup work runs on unique texts only.
    *   2. MinHash-LSH candidates + exact-Jaccard verify on the unique
    *      texts.
    *   3. Connected components → canonical id per near-dup cluster.
    *
    * Returns df's rows labeled: `exact_rep` (canonical id of the exact-
    * duplicate group) and `cluster_rep` (canonical id of the near-dup
    * cluster); rows to keep are `idCol == cluster_rep`. */
  def pipeline(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, n: Int = 3): DataFrame = {
    val groups = exactGroups(df, idCol, textCol)
      .select(col("content_hash"), col("keep_id"))
    val withHash = df.withColumn("__h", md5(col(textCol)))
      .join(groups.withColumnRenamed("content_hash", "__h"), Seq("__h"))
      .withColumnRenamed("keep_id", "exact_rep")
    val uniqueTexts = withHash.where(col(idCol) === col("exact_rep"))
      .select(col(idCol), col(textCol))
    val pairs = minhashLshPairs(uniqueTexts, idCol, textCol, threshold, n)
    val clusters = nearDedupClusters(uniqueTexts, idCol, pairs)
      .withColumnRenamed("cluster_id", "cluster_rep")
      .withColumnRenamed("id", "exact_rep")
    withHash.join(clusters, Seq("exact_rep"))
      .drop("__h")
  }

  /** The keep-set of `pipeline`: one canonical row per near-dup cluster. */
  def pipelineKeep(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, n: Int = 3): DataFrame = {
    val labeled = pipeline(df, idCol, textCol, threshold, n)
    labeled.where(col(idCol) === col("cluster_rep"))
      .drop("exact_rep", "cluster_rep")
  }

  // ---------------------------------------------------- Connected components

  /** Large-star round (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC 2014): every node connects each of its
    * STRICTLY LARGER neighbors to the minimum of its closed
    * neighborhood. Input/output edges are oriented large→small
    * (src > dst); the round preserves that invariant and never emits a
    * self-loop. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val adj = edges.union(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val mn = adj.groupBy("src").agg(min(col("dst")).as("__mn"))
      .select(col("src"), least(col("src"), col("__mn")).as("__m"))
    adj.join(mn, Seq("src"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .distinct()
  }

  /** Small-star round: every node connects its (all smaller, by the
    * orientation invariant) neighbors and itself to the minimum
    * neighbor. Orientation src > dst is preserved. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mn = edges.groupBy("src").agg(min(col("dst")).as("__m"))
    val relinked = edges.join(mn, Seq("src"))
      .where(col("dst") =!= col("__m"))
      .select(col("dst").as("src"), col("__m").as("dst"))
    val toCenter = mn.select(col("src"), col("__m").as("dst"))
    relinked.union(toCenter).distinct()
  }

  /** Duplicate-cluster formation: given near-dup PAIRS, label every id
    * with the minimum id reachable in its connected component (the
    * canonical representative).
    *
    * TWO-PHASE algorithm, tuned to the two graph shapes dup clusters
    * actually take:
    *
    *   Phase 1 — min-label propagation for `propagationRounds` rounds
    *   (one equi-join + one groupBy = 2 shuffles per round, convergence
    *   marker fused into the round's single action). O(diameter)
    *   rounds; dup clusters are near-CLIQUES in practice (diameter
    *   2-3), so this phase almost always finishes — at the cheapest
    *   per-round plan there is.
    *
    *   Phase 2 — reached ONLY if phase 1 hasn't converged (a
    *   high-diameter shape: transitive near-dup CHAINS doc₁≈doc₂≈…≈
    *   doc₄₀, a documented real-corpus phenomenon): alternating
    *   large-star / small-star rounds (Kiveris et al., "Connected
    *   Components in MapReduce and Beyond", SoCC 2014) — O(log n)
    *   rounds for ANY shape. Phase-1 labels are not wasted: each
    *   (id → label) fact is a component-preserving shortcut edge
    *   (label is reachable from id by construction) unioned into the
    *   phase-2 edge set, so propagation work converts into contraction.
    *   Convergence is exact edge-set equality in ONE aggregate over
    *   materialized checkpoints (any (src, dst) group of the tagged
    *   union not seen exactly twice is a difference), not a checksum.
    *
    * With log₂-round convergence the phase-2 cap is unreachable for
    * physical data (2^30-deep contraction needs > 10^9-node paths); if
    * it IS hit, the function THROWS rather than returning wrong
    * labels — callers (nearDedupClusters / pipeline / dedupSemanticKeep
    * / leakage-safe splits) inherit loud failure instead of silent
    * corruption (the pre-round-7 min-label cap returned silently split
    * clusters). DifferentialSpec pins a diameter-40 path graph — which
    * exercises the phase-2 escalation — against an independent
    * union-find oracle. */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIters: Int = 30, propagationRounds: Int = 6,
      checkpointDir: Option[String] = None): DataFrame = {
    // Per-round lineage truncation. Default localCheckpoint stores
    // blocks on EXECUTORS ONLY — fastest, but not recoverable: on a
    // real cluster one lost/preempted executor fails the job mid-
    // iteration. Pass `checkpointDir` (HDFS/object-store path) to
    // route through reliable checkpoint() instead — each round then
    // pays a distributed write, and the job survives executor loss.
    // Value-identical either way (spec-locked in TextDedupSpec).
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // Materialize the narrow (src, dst) projection ONCE: the input
    // pairs frame usually carries an expensive lineage (LSH candidate
    // joins, shingle kernels, verification), and both the edge set and
    // the node set need it — deriving either straight from `pairs`
    // would re-execute that whole lineage a second time.
    val p0 = ckpt(pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    // Symmetrized edges for phase 1; nodes covers self-pairs too.
    val symEdges = ckpt(p0
      .union(p0.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct())
    val nodes = ckpt(p0.select(col("src").as("id"))
      .union(p0.select(col("dst").as("id")))
      .distinct())
    var labels = ckpt(nodes.withColumn("cluster_id", col("id")))
    var converged = symEdges.isEmpty
    var iter = 0
    while (!converged && iter < propagationRounds) {
      val nbrMin = symEdges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("cluster_id")).as("__nbr"))
      // Convergence marker computed IN the update pass: the round runs
      // ONE action (the eager localCheckpoint), and the converged test
      // is then a filter-isEmpty over the materialized blocks.
      // localCheckpoint also truncates lineage, which otherwise doubles
      // per round (an analyzer-blowup hazard past ~15 rounds).
      val next = ckpt(labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("__nbr"), col("cluster_id")))
            .as("cluster_id"),
          (col("__nbr") < col("cluster_id")).as("__changed")))
      converged = next.where(col("__changed")).isEmpty
      labels = next.drop("__changed")
      iter += 1
    }
    if (converged) return labels
    // Phase 2: star rounds over original edges + phase-1 shortcuts,
    // canonically oriented large → small, self-loops dropped.
    var edges = symEdges
      .union(labels.where(col("id") =!= col("cluster_id"))
        .select(col("id").as("src"), col("cluster_id").as("dst")))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    edges = ckpt(edges)
    iter = 0
    while (!converged && iter < maxIters) {
      val next = ckpt(smallStar(largeStar(edges)))
      converged = next.union(edges)
        .groupBy("src", "dst").agg(count(lit(1)).as("__n"))
        .where(col("__n") =!= 2).isEmpty
      edges = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters alternating " +
        "large-star/small-star rounds — refusing to return partial " +
        "cluster labels. This should be unreachable (rounds are " +
        "O(log n)); raise maxIters only after verifying the input.")
    // At convergence the edge set is a star forest: child → component
    // min. Roots label themselves; nodes with no surviving edge are
    // singletons.
    val children =
      edges.select(col("src").as("id"), col("dst").as("cluster_id"))
    val roots = edges.select(col("dst")).distinct()
      .select(col("dst").as("id"), col("dst").as("cluster_id"))
    nodes.join(children.union(roots).distinct(), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Near-dedup keep-set: every doc labeled with its cluster's canonical
    * id; docs in no pair are their own singleton cluster. */
  def nearDedupClusters(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
  }

  // ------------------------------------------------------- Embedding cosine

  /** Cosine similarity between two array<double> columns via the native
    * codegen'd expressions (graft.functions.ArrayDot/ArrayNorm) — no UDF
    * boxing, evaluated inside whole-stage codegen. Strict ascending-
    * index accumulation keeps DuckDB's list_reduce bit-identical. */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.array_cosine(a, b)

  /** Embedding-cosine near-duplicate pairs: all (a < b) with
    * cosine ≥ threshold. EXACT — identical output to
    * [[embeddingNearDupPairsAllPairs]] (asserted in SimilaritySpec) —
    * but shaped for a cluster:
    *
    *   1. assign every vector to its nearest of `nCells` k-means
    *      centroids (deterministic seeded training; assignment is one
    *      compiled-UDF scan) and record its ANGLE to that centroid;
    *   2. prune CELL PAIRS with the angular triangle inequality:
    *      θ(a,b) ≥ θ(cᵢ,cⱼ) − rᵢ − rⱼ (r = max angle of a cell's
    *      members to its centroid), so a cell pair with
    *      θ(cᵢ,cⱼ) − rᵢ − rⱼ > arccos(threshold) can hold NO
    *      qualifying pair — pruning is exact for any data, and strong
    *      exactly when embeddings are clustered (the common case for
    *      real near-dup corpora);
    *   3. join the surviving (cellᵢ, cellⱼ) blocks — an equi-join on
    *      the cell key (salted for balance), never a CartesianProduct;
    *      each unordered pair is enumerated once, halving the naive n²
    *      dot products even with zero pruning.
    *
    * Worst case (unclustered data, low threshold — e.g. the synthetic
    * test embeddings) the pair work is inherently Θ(n²)/2: no exact
    * method can prune a threshold below the data's ambient similarity.
    * For approximate near-dup at scale, compose
    * `SimilaritySearch.withBuckets` candidates with the exact verify.
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, saltFactor: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.array_dot
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val cs = SimilaritySearch.trainIvfCentroids(df, vecCol, nCells, iters = 3)
    val csNorm = cs.map(c => math.sqrt(c.map(x => x * x).sum))
    // cell = argmin ||v - c||²; angle = arccos(cos(v, c_cell)). One
    // compiled UDF pass (compiled beats the CodegenFallback HOFs here).
    val assign = udf { v: Seq[Double] =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      var dot = 0.0; var n2 = 0.0; var i = 0
      while (i < v.length) { dot += v(i) * cs(best)(i); n2 += v(i) * v(i); i += 1 }
      val denom = math.sqrt(n2) * csNorm(best)
      val cosC = if (denom == 0) 1.0 else math.max(-1.0, math.min(1.0, dot / denom))
      (best, math.acos(cosC), math.sqrt(n2))
    }
    // localCheckpoint: the radii job and the pair join must read the
    // SAME materialized assignment; blocks are GC-cleaned (vs cache).
    val base = df
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      // Null/empty vectors can't be near anything (the all-pairs anchor
      // yields null cosine → filtered); drop them BEFORE the assign UDF,
      // which dereferences the vector.
      .where(col("__v").isNotNull && size(col("__v")) > 0)
      .repartition(p)
      .withColumn("__a", assign(col("__v")))
      .select(col("__id"), col("__v"), col("__a._1").as("__cell"),
        col("__a._2").as("__angle"), col("__a._3").as("__norm"))
      .localCheckpoint()
    // O(nCells) rows to the driver.
    val radii: Map[Int, Double] =
      base.groupBy(col("__cell")).agg(max(col("__angle")).as("__r"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // 1e-6 covers the oracle's round-then-compare at the threshold edge;
    // 1e-9 covers float error in the angle arithmetic itself.
    val thetaTau =
      math.acos(math.max(-1.0, math.min(1.0, threshold - 1e-6)))
    def centroidAngle(i: Int, j: Int): Double = {
      var dot = 0.0; var k = 0
      while (k < cs(i).length) { dot += cs(i)(k) * cs(j)(k); k += 1 }
      val denom = csNorm(i) * csNorm(j)
      if (denom == 0) 0.0
      else math.acos(math.max(-1.0, math.min(1.0, dot / denom)))
    }
    val cells = radii.keys.toSeq.sorted
    val allowed = for {
      i <- cells; j <- cells if i <= j
      if centroidAngle(i, j) - radii(i) - radii(j) <= thetaTau + 1e-9
    } yield (i, j)
    import spark.implicits._
    val allowedDf = allowed.toDF("__cl", "__cr")
    // Each unordered cell pair enumerated once: the lexically-smaller
    // cell is always the LEFT side. Salt spreads a cell's rows over
    // saltFactor reducers (the cell key alone has only nCells values —
    // too coarse for full-cluster parallelism).
    val lhs = base
      .select(col("__id").as("__ida"), col("__v").as("__va"),
        col("__norm").as("__na"), col("__cell").as("__cella"))
      .join(broadcast(allowedDf), col("__cella") === col("__cl"))
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val rhs = base
      .select(col("__id").as("__idb"), col("__v").as("__vb"),
        col("__norm").as("__nb"), col("__cell").as("__cellb"))
      .withColumn("__saltb",
        pmod(xxhash64(col("__idb")), lit(saltFactor)).cast("int"))
    lhs.join(rhs,
        col("__cr") === col("__cellb") && col("__salt") === col("__saltb"))
      // same-cell blocks see both orders — keep one; cross-cell blocks
      // see exactly one order already.
      .where(col("__cella") =!= col("__cellb") || col("__ida") < col("__idb"))
      .withColumn("cosine", graft.functions.DetRound.det6(
        array_dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))))
      .where(col("cosine") >= threshold)
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"), col("cosine"))
  }

  /** Duplicated-SPAN removal (the corpus-level complement of whole-doc
    * dedup, per RefinedWeb / "Deduplicating Training Data Makes
    * Language Models Better": repeated boilerplate passages recur
    * inside otherwise-distinct documents, and whole-doc near-dedup
    * never sees them). Every document is sliced into non-overlapping
    * `chunkSize`-codepoint spans; a span whose exact text occurs
    * anywhere else in the corpus survives only at its FIRST occurrence
    * (minimum (id, chunk_idx)); later occurrences are excised and each
    * document is reassembled from its surviving spans in order.
    *
    * Scale shape: the first-occurrence winner per span hash is a
    * hash-GROUPBY `min(struct(id, idx))` — map-side combined, no
    * window, so a boilerplate span repeated 10⁹ times costs one
    * combine tree, not one sorted partition (the window formulation
    * would serialize exactly on the hot spans this operator exists to
    * remove). The winner set joins back on the span hash (broadcastable
    * when the duplicate universe is small; shuffle hash join
    * otherwise), and reassembly is one groupBy over doc ids.
    *
    * Returns (idCol, n_chunks, n_kept, clean_text): span counts before/
    * after excision and the reassembled text (empty when every span was
    * a later duplicate). Chunking is codepoint-based — see
    * [[TextFunctions.chunkFn]] for the DuckDB substr parity contract.
    */
  def spanDedup(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 200): DataFrame = {
    val ch = df
      .select(col(idCol).as("__id"),
        explode(TextFunctions.chunks(col(textCol), chunkSize, 0)).as("__c"))
      .select(col("__id"), col("__c._1").as("__idx"),
        col("__c._3").as("__chunk"))
      .withColumn("__h", md5(col("__chunk")))
    val firsts = ch.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__idx"))).as("__first"))
    ch.join(firsts, Seq("__h"))
      .withColumn("__kept",
        struct(col("__id"), col("__idx")) === col("__first"))
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("__kept"), 1).otherwise(0)).cast("int").as("n_kept"),
        // collect_list drops nulls, so only kept spans enter; sort_array
        // on struct(idx, chunk) orders by the unique idx — deterministic
        concat_ws("", transform(
          sort_array(collect_list(when(col("__kept"),
            struct(col("__idx"), col("__chunk"))))),
          x => x.getField("__chunk"))).as("clean_text"))
  }

  /** All-pairs anchor for [[embeddingNearDupPairs]]: the O(n²)
    * cross-join formulation — the verify/oracle reference, never the
    * scale path. */
  def embeddingNearDupPairsAllPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.{array_dot, array_norm}
    val p = df.sparkSession.sparkContext.defaultParallelism
    val v = df.select(col(idCol).as("id_a"),
      col(vecCol).cast("array<double>").as("__va")).repartition(p)
      .withColumn("__na", array_norm(col("__va")))
    val w = df.select(col(idCol).as("id_b"),
      col(vecCol).cast("array<double>").as("__vb"))
      .withColumn("__nb", array_norm(col("__vb")))
    v.crossJoin(w)
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.functions.DetRound.det6(
        array_dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Distinct character n-grams of a string (compiled kernel). */
  private[ext] def charGramFn(n: Int): String => Seq[String] = { s: String =>
    val t = if (s == null) "" else s
    if (t.length < n) Nil
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= t.length) { out += t.substring(i, i + n); i += 1 }
      out.toSeq
    }
  }

  /** FUZZY (edit-distance) near-duplicate pairs over a short key
    * column — the entity-resolution shape (names, titles, URLs):
    * all (a < b) with ≥ `minShared` common character n-grams of the
    * lowercased `keyLen`-prefix key AND levenshtein ≤ `maxDist`.
    *
    * Same two-stage discipline as the other dedup lanes: cheap
    * BLOCKING (distinct char-gram explode → equi-self-join → shared
    * count, with the stop-gram df cap bounding any gram's pair
    * fan-out at df², exactly `jaccardPairs`' skew lever) and an
    * EXACT verify (one codegen'd `levenshtein` per candidate — O(k²)
    * on ≤ keyLen chars, never on whole documents). Blocking recall is
    * probabilistic (two strings within maxDist share many grams unless
    * edits are adversarially spread — the dedup_winnow argument);
    * precision is exact. Output: (id_a, id_b, shared, dist).
    *
    * The df cap is COMPOSITE by default:
    * `min(maxGramDfFrac · N, maxGramDfCeil)`. The corpus-relative term
    * (fraction of the row count, one cheap count job) keeps the cap
    * from silently blocking EVERY gram at 10× — a duplicated gram's df
    * grows with the corpus (measured in SCALE.md's round-8 probe). But
    * fraction ALONE is a quadratic trap: pair fan-out per surviving
    * gram is O(df²), so a 0.2·N-df gram yields 0.04·N² candidates —
    * the cap itself would GROW the quadratic term with corpus size.
    * The absolute ceiling bounds any single gram's fan-out at ceil²
    * regardless of N (a gram carried by that many rows has no blocking
    * selectivity left to lose — recall rests on the rarer grams, and a
    * true near-pair needs only `minShared` survivors). When the
    * ceiling binds (frac·N > ceil, i.e. N > ceil/frac) a LOUD stderr
    * line says so, with the measured candidate growth at 10×/100× in
    * SCALE.md (`fuzzycap` probe). Pass `maxGramDf > 0` to pin an
    * absolute cap instead (tests / probes that control the corpus). */
  def fuzzyPairs(
      df: DataFrame, idCol: String, strCol: String,
      keyLen: Int = 80, gram: Int = 3, maxGramDf: Int = -1,
      minShared: Int = 4, maxDist: Int = 20,
      maxGramDfFrac: Double = 0.2, maxGramDfCeil: Int = 10000): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val dfCap: Long =
      if (maxGramDf > 0) maxGramDf.toLong
      else {
        val frac = math.max(1L, math.ceil(maxGramDfFrac * df.count()).toLong)
        if (frac > maxGramDfCeil)
          System.err.println(
            s"[graft] Dedup.fuzzyPairs: corpus-relative df cap $frac " +
              s"exceeds the absolute ceiling $maxGramDfCeil — capping " +
              s"there (bounds any gram's pair fan-out at ceil² " +
              "instead of (frac·N)²; raise maxGramDfCeil only with a " +
              "measured candidate budget)")
        math.min(frac, maxGramDfCeil.toLong)
      }
    val k = df.select(col(idCol).as("__id"),
        lower(substring(coalesce(col(strCol), lit("")), 1, keyLen)).as("__s"))
      .repartition(p).localCheckpoint() // 3 consumers: grams + 2 verifies
    val g0 = k.select(col("__id"),
      explode(udf(charGramFn(gram)).apply(col("__s"))).as("__gr"))
    val rare = g0.groupBy(col("__gr")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= dfCap).select(col("__gr"))
    val g = g0.join(rare, Seq("__gr"), "left_semi")
      .repartition(p, col("__gr")).localCheckpoint()
    val cand = g.select(col("__id").as("id_a"), col("__gr"))
      .join(g.select(col("__id").as("id_b"), col("__gr")), Seq("__gr"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    cand
      .join(k.select(col("__id").as("id_a"), col("__s").as("__sa")), Seq("id_a"))
      .join(k.select(col("__id").as("id_b"), col("__s").as("__sb")), Seq("id_b"))
      // banded DP with early exit (Spark 4 3-arg levenshtein): -1 when
      // the distance exceeds maxDist, the exact distance otherwise —
      // surviving rows carry values identical to the unbanded form,
      // at O(len·maxDist) instead of O(len²) per candidate.
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("shared"), col("dist"))
  }
}
