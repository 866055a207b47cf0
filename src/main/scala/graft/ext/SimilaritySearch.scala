package graft.ext

import org.apache.spark.sql.{DataFrame, Column, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - `bruteForceTopK`: exact baseline — broadcast the (small) query
  *     set against every candidate, cosine via codegen'd array fold,
  *     per-query top-k via window. Shuffle = candidates × queries rows
  *     of (id, id, score) only; vectors never shuffle twice.
  *   - `lshTopK`: scale path — sign-random-projection LSH. Each vector
  *     hashes to a bucket id from the signs of `numPlanes` projections
  *     onto deterministic pseudo-random hyperplanes; candidates are
  *     vectors sharing a bucket with the query under any of `numTables`
  *     independent tables. Recall tunes with planes/tables; cost is
  *     O(candidates-in-bucket) instead of O(n) per query.
  *
  * At 100 TB: bucket ids are materialized once (a column, partitionable
  * / bucketable on write), so query-time work is a broadcast-join on
  * (table, bucket) — no full scan.
  */
object SimilaritySearch {

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim) — splitmix64 mapped to [-1, 1). No RNG state, reproducible on
    * any executor. */
  private def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    var z = table.toLong * 0x9E3779B97F4A7C15L +
      plane.toLong * 0xC2B2AE3D27D4EB4FL + dim.toLong * 0x165667B19E3779F9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** One full hyperplane as literal components — for external
    * replication of the bucketing (e.g. the driver's DuckDB oracle,
    * which inlines these as SQL literals). Same (table, plane, dim)
    * derivation as [[bucketFn]]. */
  def planeVector(table: Int, plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => planeComponent(table, plane, d))

  /** LSH bucket id for one table: bit b = sign of dot(vec, plane_b). */
  def bucketFn(numPlanes: Int, table: Int): Seq[Float] => Long = {
    vec: Seq[Float] => {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        var dot = 0.0
        var d = 0
        while (d < vec.length) {
          dot += vec(d) * planeComponent(table, p, d)
          d += 1
        }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
  }

  /** Exact cosine top-k: for each query vector (small set, broadcast),
    * the k nearest candidates by cosine. Scores rounded to 6dp before
    * ranking with an id tiebreak, so ranking is engine-deterministic. */
  def bruteForceTopK(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val q = queriesDf.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", graft.functions.DetRound.det6(Dedup.cosineCol(col("__qv"), col("__cv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }

  /** Assign LSH bucket columns: one bucket id per table. */
  def withBuckets(
      df: DataFrame, vecCol: String,
      numPlanes: Int = 12, numTables: Int = 4): DataFrame = {
    (0 until numTables).foldLeft(df) { (acc, t) =>
      val f = udf(bucketFn(numPlanes, t))
      acc.withColumn(s"__bucket_$t", f(col(vecCol)))
    }
  }

  // ------------------------------------------------------------------- IVF

  /** Train IVF centroids: deterministic seeded sample → k-means (Lloyd).
    *
    * The coarse quantizer trains on a BOUNDED sample (`sampleSize` rows,
    * the FAISS convention): the sample selection is distributed (a
    * TakeOrdered over a seeded hash — one job at any data size), and the
    * Lloyd iterations then run driver-side over the collected sample —
    * O(sampleSize × k × dim) CPU on ≤ a few MB, with ZERO per-iteration
    * Spark jobs. The collect is O(sampleSize), a constant — never
    * O(rows). Training on a sample (not the full data) is the standard
    * IVF recipe: cell quality saturates long before 10k points, and
    * pruning/probing correctness never depends on centroid quality. */
  def trainIvfCentroids(
      df: DataFrame, vecCol: String, k: Int, iters: Int = 5,
      sampleSize: Int = 10000, seed: Long = 1337L): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = df
      .select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull && size(col("v")) > 0)
      .orderBy(xxhash64(col("v").cast("string"), lit(seed)))
      .limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, s"no non-empty vectors in $vecCol")
    val dim = sample.head.length
    var centroids: Array[Array[Double]] = sample.take(k)
    (1 to iters).foreach { _ =>
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val ns = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val x = v(i) - centroids(c)(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        ns(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (ns(c) == 0) centroids(c)
        else sums(c).map(_ / ns(c))
      }.toArray
    }
    centroids
  }

  /** Nearest-centroid finder (squared-L2). Returns a CLOSURE capturing
    * only the centroid array, so udfs built from it serialize without
    * dragging the module object into the task closure. */
  private def cellFinder(
      cs: Array[Array[Double]]): (Seq[Double], Int) => Seq[Int] =
    (v: Seq[Double], n: Int) =>
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
        (c, d)
      }.sortBy(_._2).take(n).map(_._1)

  /** ANN top-k via IVF: vectors pre-assigned to their nearest centroid
    * (a materialized partition/bucket column at scale); a query probes
    * the `nProbe` nearest centroid cells only. */
  def ivfTopK(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val cs = trainIvfCentroids(candidates, vecCol, nCentroids, iters)
    val nearest = cellFinder(cs)
    val assignOne = udf { v: Seq[Double] => nearest(v, 1).head }
    val probeN = udf { v: Seq[Double] => nearest(v, nProbe) }
    val cand = candidates.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cell", assignOne(col("__cv")))
    val q = queriesDf.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__cell", explode(probeN(col("__qv"))))
    import graft.functions.VectorFunctions.array_cosine
    // No distinct needed: a candidate sits in exactly ONE cell and a
    // query's probe cells are distinct, so each (query, cand) pair joins
    // at most once — the old distinct() shuffled both vectors per pair.
    val scored = cand.join(broadcast(q), Seq("__cell"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        graft.functions.DetRound.det6(array_cosine(col("__qv"), col("__cv"))))
      .select(col("query_id"), col("cand_id"), col("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }

  // ------------------------------------------------- scalar quantization

  /** Global symmetric int8 scale: max |component| over the corpus — one
    * aggregate job, one scalar of driver state. */
  def quantizationScale(df: DataFrame, vecCol: String): Double = {
    val row = df
      .select(col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) > 0)
      .agg(max(array_max(transform(col("__v"), x => abs(x)))))
      .collect()(0)
    require(!row.isNullAt(0), s"no non-empty vectors in $vecCol")
    val s = row.getDouble(0)
    require(s > 0, s"cannot quantize: max |$vecCol| component is 0")
    s
  }

  /** The int8 quantizer kernel — ONE definition shared by every
    * write-time and query-time path (quantizedTopK, ivfQuantizedTopK,
    * writeQuantizedIndex, ivfQuantizedTopKAtRest): the at-rest index
    * and the query-side scoring MUST round bit-identically or at-rest
    * scores silently diverge from the oracle. */
  /** Saturating on purpose: a component beyond ±scale clamps to ±127
    * (standard int8 practice). A no-op when scale is the corpus max —
    * the clamp only bites for vectors quantized under a FROZEN scale
    * from an older build (upsertQuantizedIndex inserts), where failing
    * the cast would otherwise abort the upsert. */
  private def qzUdf(scale: Double) = udf((v: Seq[Double]) =>
    if (v == null) null
    else v.map(x =>
      math.max(-127.0, math.min(127.0, math.floor(x / scale * 127 + 0.5)))))

  /** Cosine top-k over int8 scalar-quantized vectors (q_i =
    * round(x_i/scale·127), symmetric global scale) — the
    * memory-bandwidth path: quantized vectors are 8× smaller than
    * float64 in shuffle/broadcast/cache, and the dot products become
    * EXACT integer arithmetic (no float summation-order concerns at
    * all; only the final norm division is floating point).
    *
    * Same output schema/ranking contract as [[bruteForceTopK]];
    * `qcosine` is the quantized-space cosine (a biased estimate of true
    * cosine — ranking fidelity vs. exact is measured in SimilaritySpec).
    * At 100 TB the quantized column is materialized once at rest and
    * every query runs against it; the float vectors never load. */
  def quantizedTopK(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val scale = quantizationScale(candidates, vecCol)
    // Quantized components are INTEGRAL doubles (|q| ≤ 127), so the
    // codegen'd array_dot / array_norm sums are IEEE-EXACT (every
    // partial sum an integer ≪ 2^53, |dot| ≤ 127²·dim): identical
    // values to 64-bit integer arithmetic — and the DuckDB oracle's
    // BIGINT formulation — with NO per-pair UDF boxing in the O(n×q)
    // scoring loop (the one udf here runs once per VECTOR, not pair;
    // measured 30.4 s → sub-10 s at 200k×20 on local[16]).
    val qz = qzUdf(scale)
    import graft.functions.VectorFunctions.{array_dot, array_norm}
    def quantized(df: DataFrame, side: String): DataFrame = df
      .select(col(idCol).as(s"${side}_id"),
        qz(col(vecCol).cast("array<double>")).as(s"__${side}q"))
      .withColumn(s"__${side}n", array_norm(col(s"__${side}q")))
      .where(col(s"__${side}n") > 0)
    val cand = quantized(candidates, "cand")
    val q = quantized(queriesDf, "query")
    val scored = cand.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("qcosine", graft.functions.DetRound.det6(
        array_dot(col("__queryq"), col("__candq")) /
          (col("__queryn") * col("__candn"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("qcosine"), col("rank"))
  }

  /** The production-scale ANN composition: IVF cells prune candidates
    * (coarse quantizer on the FLOAT vectors — a partition/bucket column
    * at rest), int8 scalar quantization cuts per-vector bandwidth 8×,
    * and the scoring loop is fully codegen'd (array_dot/array_norm over
    * integral doubles — IEEE-exact, see [[quantizedTopK]]).
    *
    * With `nProbe = nCentroids` the candidate set is every non-self
    * pair, so the result PROVABLY equals [[quantizedTopK]] (the driver
    * entry runs that configuration and shares its oracle); selective
    * probing trades recall for cost, measured in RetrievalSpec. */
  def ivfQuantizedTopK(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val scale = quantizationScale(candidates, vecCol)
    val cs = trainIvfCentroids(candidates, vecCol, nCentroids, iters)
    val nearest = cellFinder(cs)
    val assignOne = udf { v: Seq[Double] => nearest(v, 1).head }
    val probeN = udf { v: Seq[Double] => nearest(v, nProbe) }
    val qz = qzUdf(scale)
    import graft.functions.VectorFunctions.{array_dot, array_norm}
    def prep(df: DataFrame, side: String): DataFrame = df
      .select(col(idCol).as(s"${side}_id"),
        col(vecCol).cast("array<double>").as("__fv"))
      .where(col("__fv").isNotNull && size(col("__fv")) > 0)
      .withColumn(s"__${side}q", qz(col("__fv")))
      .withColumn(s"__${side}n", array_norm(col(s"__${side}q")))
      .where(col(s"__${side}n") > 0)
    val cand = prep(candidates, "cand")
      .withColumn("__cell", assignOne(col("__fv"))).drop("__fv")
    val q = prep(queriesDf, "query")
      .withColumn("__cell", explode(probeN(col("__fv")))).drop("__fv")
    // candidate in exactly ONE cell × distinct probe cells → each pair
    // joins at most once; no distinct needed (the ivfTopK argument).
    val scored = cand.join(broadcast(q), Seq("__cell"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("qcosine", graft.functions.DetRound.det6(
        array_dot(col("__queryq"), col("__candq")) /
          (col("__queryn") * col("__candn"))))
      .select(col("query_id"), col("cand_id"), col("qcosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("qcosine"), col("rank"))
  }

  // ------------------------------------------------- at-rest IVF index

  /** Materialize the IVF + int8 index AT REST: one parquet table
    * `(cand_id, q int8[], n double)` written `partitionBy(cell)` — the
    * layout SCALE.md claims for 100 TB serving. The quantized column is
    * stored as `array<tinyint>` (the actual 8× bandwidth cut on disk,
    * not just in flight); the float vectors are NOT in the index —
    * they never load at query time. Returns the query-side quantizer
    * state (scale, centroids): O(k × dim) driver values, the
    * IVF-centroid convention.
    */
  def writeQuantizedIndex(
      candidates: DataFrame, idCol: String, vecCol: String, path: String,
      nCentroids: Int = 16, iters: Int = 3,
      keyBuckets: Int = 64): (Double, Array[Array[Double]]) = {
    val scale = quantizationScale(candidates, vecCol)
    val cs = trainIvfCentroids(candidates, vecCol, nCentroids, iters)
    val nearest = cellFinder(cs)
    val assignOne = udf { v: Seq[Double] => nearest(v, 1).head }
    val qz = qzUdf(scale)
    import graft.functions.VectorFunctions.array_norm
    val base = candidates
      .select(col(idCol).as("cand_id"),
        col(vecCol).cast("array<double>").as("__fv"))
      .where(col("__fv").isNotNull && size(col("__fv")) > 0)
      .withColumn("__q", qz(col("__fv")))
      .withColumn("n", array_norm(col("__q")))
      .where(col("n") > 0)
      .withColumn("cell", assignOne(col("__fv")))
      // |q_i| <= 127 integral → tinyint is lossless; norm kept as the
      // one precomputed double (sqrt of an exact integer).
      .select(col("cand_id"), col("__q").cast("array<tinyint>").as("q"),
        col("n"), col("cell"))
    val withSidecar = keyBuckets > 0
    // checkpoint only when a second consumer (the keymap write) exists
    val rows = if (withSidecar) base.localCheckpoint() else base
    // Cluster by the partition column before the partitioned write:
    // without this every task writes a file into EVERY cell dir
    // (tasks × cells small files — the classic partitionBy
    // explosion); with it each cell lands in one task → one file per
    // cell. Costs one shuffle of the (already 8×-shrunk) index rows —
    // the standard trade for a sane at-rest layout.
    rows.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // KEYMAP sidecar (key → cell), partitioned by a hash bucket of the
    // key: upsertQuantizedIndex's touched-cell discovery prunes to the
    // changed keys' buckets instead of scanning the whole index — the
    // piece that keeps upsert cost change-set-proportional at 100 TB.
    // Lives INSIDE the index dir under an underscore name, so partition
    // discovery on `path` never sees it and cleanup stays one delete.
    // `keyBuckets <= 0` skips it (a read-only serving index doesn't
    // need CDC machinery); [[rebuildKeymap]] adds it later if plans
    // change, and an upsert against a sidecar-less index falls back to
    // full-scan discovery.
    if (withSidecar) {
      rows.select(col("cand_id"), col("cell"))
        .withColumn("kb", keyBucketCol(col("cand_id"), keyBuckets))
        .repartition(col("kb"))
        .write.mode("overwrite").partitionBy("kb").parquet(keymapPath(path))
      writeKeyBucketsMeta(candidates.sparkSession, path, keyBuckets)
    }
    (scale, cs)
  }

  private def keymapPath(path: String): String =
    path.stripSuffix("/") + "/_keymap"

  /** [[upsertQuantizedIndex]] collects at most this many distinct
    * changed keys for the fused key profile (bounded driver state — a
    * few MB; CDC change sets are delta-sized by contract). Oversized
    * batches keep the distributed key-set shape. */
  private val UpsertKeyProfileMax = 65536

  /** Write-side and read-side MUST bucket identically; the bucket count
    * is recorded next to the keymap (underscore file — invisible to the
    * parquet reader) so upsert never has to guess it. */
  private def keyBucketCol(id: Column, keyBuckets: Int): Column =
    pmod(xxhash64(id), lit(keyBuckets.toLong)).cast("int")

  private def keyBucketsMetaPath(path: String) =
    new org.apache.hadoop.fs.Path(keymapPath(path), "_graft_keybuckets")

  /** Framed ("v1:<n>\n") and written via temp-file + rename so a crash
    * mid-write can never leave a half-written count that would prune
    * the WRONG buckets — an unparseable/absent meta file instead
    * disables pruning (full-scan fallback, correct either way). */
  private def writeKeyBucketsMeta(
      spark: SparkSession, path: String, keyBuckets: Int): Unit = {
    val p = keyBucketsMetaPath(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s"._graft_keybuckets.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v1:$keyBuckets\n".getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
  }

  private def readKeyBucketsMeta(
      spark: SparkSession, path: String): Option[Int] =
    scala.util.Try {
      val p = keyBucketsMetaPath(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try {
          val buf = new java.io.ByteArrayOutputStream()
          val bytes = new Array[Byte](64)
          var n = in.read(bytes)
          while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
          buf.toString("UTF-8")
        } finally in.close()
        // The frame IS the integrity check: prefix + newline prove the
        // write completed (a truncated "v1:6" of "v1:64\n" fails).
        if (text.startsWith("v1:") && text.endsWith("\n"))
          Some(text.stripPrefix("v1:").trim.toInt)
        else None
      }
    }.toOption.flatten

  /** Incremental at-rest index maintenance: apply a CDC change-set
    * (`opCol` ∈ {"I","U","D"}, keyed by `idCol`; I/U carry the new
    * vector) to an index written by [[writeQuantizedIndex]], rewriting
    * ONLY the touched cells via DYNAMIC partition overwrite — cost
    * tracks the change set (touched cells × cell size), never the
    * index size. The quantizer state (scale, centroids) is FROZEN from
    * the original build: retraining would reassign every row's cell
    * and force a full rewrite (corpus drift ⇒ rebuild, not upsert —
    * the standard IVF serving convention). Touched = cells where
    * upserted vectors LAND ∪ cells currently HOLDING a changed key (an
    * update can move a vector across cells — the old copy must go; a
    * delete empties its slot). Idempotent: replaying the same
    * change-set reproduces the same index (UpsertSpec). The
    * one-file-per-cell layout is preserved (repartition on the
    * partition column before the write).
    *
    * Touched-cell DISCOVERY is itself change-set-proportional: the
    * keymap sidecar (key → cell, bucketed by key hash; written by
    * [[writeQuantizedIndex]]) is read with a static `kb IN (...)`
    * partition filter over the changed keys' buckets — the index data
    * files are never scanned to find the old locations. (An index
    * written before the sidecar existed falls back to a column-pruned
    * full scan of (cand_id, cell) — correct, but O(index); see
    * [[rebuildKeymap]] to migrate.) The keymap's changed buckets are
    * rewritten in the same dynamic-overwrite style. Dynamic overwrite
    * only replaces partitions PRESENT in the written data, so both
    * writes explicitly delete any touched partition whose post-upsert
    * content is empty (a cell losing its last vector, a bucket losing
    * its last key) — without that, the deleted rows would silently
    * remain at rest.
    *
    * DURABILITY: the index write and the keymap write are two separate
    * jobs with no cross-file transaction (immutable-parquet engine, no
    * table format by design) — a crash between them leaves the keymap
    * pointing at pre-upsert cells, and discovery through a stale map
    * can miss a moved row on the NEXT upsert. Recovery is
    * [[rebuildKeymap]] (one column-pruned index scan) before
    * re-running the change set; the change-set replay itself is
    * idempotent. */
  def upsertQuantizedIndex(
      changes: DataFrame, idCol: String, vecCol: String, opCol: String,
      path: String, scale: Double,
      centroids: Array[Array[Double]]): Unit = {
    val spark = changes.sparkSession
    val nearest = cellFinder(centroids)
    val assignOne = udf { v: Seq[Double] => nearest(v, 1).head }
    val qz = qzUdf(scale)
    import graft.functions.VectorFunctions.array_norm
    // Loud guard on the AT-MOST-ONE-op-per-key CDC contract (same as
    // SnapshotMerge): duplicate I/U rows would both survive the
    // anti-join and corrupt the index with two rows per key; U-then-D
    // would resurrect a deleted key. One window count over the (small
    // by contract) change set; assert_true fails executor-side on the
    // first violation.
    val filtered = {
      import org.apache.spark.sql.expressions.Window
      changes.where(col(opCol).isin("I", "U", "D"))
        .withColumn("__kc",
          count(lit(1)).over(Window.partitionBy(col(idCol))))
        .withColumn("__chk", assert_true(col("__kc") === 1,
          concat(lit(s"upsertQuantizedIndex: duplicate key in changes: "),
            col(idCol).cast("string"))))
        .where(col("__chk").isNull)
        .drop("__kc", "__chk")
    }
    val upserts = filtered.where(col(opCol) =!= "D")
      .select(col(idCol).as("cand_id"),
        col(vecCol).cast("array<double>").as("__fv"))
      .where(col("__fv").isNotNull && size(col("__fv")) > 0)
      .withColumn("__q", qz(col("__fv")))
      .withColumn("n", array_norm(col("__q")))
      .where(col("n") > 0)
      .withColumn("cell", assignOne(col("__fv")))
      .select(col("cand_id"), col("__q").cast("array<tinyint>").as("q"),
        col("n"), col("cell"))
      .localCheckpoint() // consumers: landing cells + index + keymap writes
    val keyBuckets = readKeyBucketsMeta(spark, path)
    // FUSED key profile — ONE bounded job where the unfused path ran
    // two (the key-set checkpoint and the changed-buckets collect):
    // the distinct changed keys WITH their bucket ids. Complete only
    // when the change set holds <= UpsertKeyProfileMax distinct keys
    // (CDC batches are delta-sized by contract); an oversized batch
    // keeps the checkpoint + collect shape. A complete profile also
    // turns `keys` into a LOCAL relation, so the three joins below
    // broadcast it instead of re-planning the distinct per consumer.
    val keyProf: Option[Array[Row]] = {
      val base = filtered.select(col(idCol).as("cand_id")).distinct()
      val g = keyBuckets
        .map(kb => base.withColumn("kb", keyBucketCol(col("cand_id"), kb)))
        .getOrElse(base)
        .limit(UpsertKeyProfileMax + 1).collect()
      if (g.length <= UpsertKeyProfileMax) Some(g) else None
    }
    val keys = keyProf match {
      case Some(g) =>
        spark.createDataFrame(
          java.util.Arrays.asList(g.map(r => Row(r.get(0))): _*),
          StructType(Seq(filtered.schema(idCol).copy(name = "cand_id"))))
      case None => filtered.select(col(idCol).as("cand_id")).distinct()
        .localCheckpoint()
    }
    // Changed keys' bucket ids — ≤ |changes| values, computed ONCE for
    // both the pruned scan and the emptied-bucket sweep.
    val changedKbs = keyBuckets.map { kb =>
      keyProf match {
        case Some(g) => g.map(_.getInt(1)).distinct
        case None => keys.select(keyBucketCol(col("cand_id"), kb).as("kb"))
          .distinct().collect().map(_.getInt(0))
      }
    }
    // ONE pruned keymap scan (changed keys' buckets only), checkpointed:
    // touched-cell discovery semi-joins it, the bucket rewrite
    // anti-joins it, and the checkpoint both shares the scan and cuts
    // lineage before the overwrite of the very files it read.
    val kmPruned = changedKbs.map { kbs =>
      val pruned =
        if (kbs.isEmpty) spark.read.parquet(keymapPath(path)).limit(0)
        else spark.read.parquet(keymapPath(path))
          .where(col("kb").isin(kbs.map(x => x: Any): _*)) // pruned scan
      pruned.localCheckpoint()
    }
    // (cand_id → cell) of changed keys currently in the index: pruned
    // keymap scan when the sidecar exists, legacy full scan otherwise.
    val oldLocs = kmPruned match {
      case Some(km) => km.join(keys, Seq("cand_id"), "left_semi")
      case None => spark.read.parquet(path)
        .join(keys, Seq("cand_id"), "left_semi")
    }
    // Bounded driver state: the distinct touched-cell ids (≤ nCentroids).
    // ONE distinct over the raw union — the old per-branch distincts
    // added two extra exchanges to dedup data a single final distinct
    // dedups anyway (same result set, one shuffle instead of three).
    val touched = oldLocs.select(col("cell"))
      .union(upserts.select(col("cell")))
      .distinct().collect().map(_.getInt(0))
    if (touched.nonEmpty) {
      val index = spark.read.parquet(path)
      val survivors = index
        .where(col("cell").isin(touched.map(c => c: Any): _*)) // pruned scan
        .join(keys, Seq("cand_id"), "left_anti")
        .select(col("cand_id"), col("q"), col("n"), col("cell"))
      val out = survivors.unionByName(upserts)
        .repartition(col("cell"))
        // Materialize BEFORE the write: the write replaces partitions of
        // the very path the survivors scan reads (checkpoint cuts the
        // lineage, so the read completes first and the overwrite-what-
        // you-read hazard cannot bite).
        .localCheckpoint()
      out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(path)
      // Dynamic overwrite only rewrites partitions PRESENT in the
      // output: a touched cell whose post-upsert content is EMPTY
      // (delete/move of its last vector) gets zero output rows and its
      // stale directory would survive — the deleted vector would stay
      // queryable. Drop those directories explicitly.
      val outCells = out.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSet
      val emptied = touched.filterNot(outCells)
      if (emptied.nonEmpty) {
        val hconf = spark.sessionState.newHadoopConf()
        emptied.foreach { c =>
          val dir = new org.apache.hadoop.fs.Path(path, s"cell=$c")
          dir.getFileSystem(hconf).delete(dir, true)
        }
      }
    }
    // Keymap maintenance: rewrite exactly the changed keys' buckets —
    // surviving entries minus changed keys, plus the upserts' new
    // locations. (The pruned scan is the checkpoint from above — no
    // second read, no overwrite-what-you-read hazard.)
    for (kb <- keyBuckets; km <- kmPruned; kbs <- changedKbs) {
      val kmSurvivors = km
        .join(keys, Seq("cand_id"), "left_anti")
        .select(col("cand_id"), col("cell"), col("kb"))
      val kmNew = upserts.select(col("cand_id"), col("cell"))
        .withColumn("kb", keyBucketCol(col("cand_id"), kb))
      val kmOut = kmSurvivors.unionByName(kmNew).repartition(col("kb"))
        .localCheckpoint() // consumed by the write AND the emptied scan
      kmOut.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("kb").parquet(keymapPath(path))
      // Same stale-partition hole as the cells: a bucket whose every
      // key was deleted yields no output rows, so dynamic overwrite
      // would leave its directory (and its deleted keys) behind.
      val outKbs = kmOut.select(col("kb")).distinct()
        .collect().map(_.getInt(0)).toSet
      val emptiedKbs = kbs.filterNot(outKbs)
      if (emptiedKbs.nonEmpty) {
        val hconf = spark.sessionState.newHadoopConf()
        emptiedKbs.foreach { b =>
          val d = new org.apache.hadoop.fs.Path(keymapPath(path), s"kb=$b")
          d.getFileSystem(hconf).delete(d, true)
        }
      }
    }
  }

  /** Rebuild the keymap sidecar from the index itself — ONE
    * column-pruned scan of (cand_id, cell). The recovery path for a
    * torn upsert (see [[upsertQuantizedIndex]] DURABILITY) and the
    * migration path for a pre-sidecar index that should stop paying
    * the full-scan discovery fallback. */
  def rebuildKeymap(
      spark: SparkSession, path: String, keyBuckets: Int = 64): Unit = {
    spark.read.parquet(path)
      .select(col("cand_id"), col("cell"))
      .withColumn("kb", keyBucketCol(col("cand_id"), keyBuckets))
      .repartition(col("kb"))
      // no checkpoint needed: the scan reads cell=* dirs, the write
      // replaces only the disjoint _keymap subtree
      .write.mode("overwrite").partitionBy("kb").parquet(keymapPath(path))
    writeKeyBucketsMeta(spark, path, keyBuckets)
  }

  /** Query the at-rest index: the bounded query set's probe cells are
    * computed driver-side (O(queries × nProbe) values) and applied as a
    * STATIC `cell IN (...)` predicate — partition PRUNING, so the scan
    * reads only the probed directories and the rest of the corpus never
    * leaves disk (PlanSpec pins PartitionFilters on this shape). Scoring
    * is identical to [[quantizedTopK]] — tinyint→double restores the
    * exact integral values, array_dot/array_norm sums are IEEE-exact —
    * so with `nProbe` = #cells the result provably equals it (shared
    * driver oracle). */
  def ivfQuantizedTopKAtRest(
      index: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, k: Int,
      scale: Double, centroids: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    val nearest = cellFinder(centroids)
    val probeN = udf { v: Seq[Double] => nearest(v, nProbe) }
    val qz = qzUdf(scale)
    import graft.functions.VectorFunctions.{array_dot, array_norm}
    val q = queriesDf
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__fv"))
      .where(col("__fv").isNotNull && size(col("__fv")) > 0)
      .withColumn("__queryq", qz(col("__fv")))
      .withColumn("__queryn", array_norm(col("__queryq")))
      .where(col("__queryn") > 0)
      .withColumn("cell", explode(probeN(col("__fv")))).drop("__fv")
      // Two actions read this frame (the probe-cell collect, then the
      // broadcast join): checkpoint so the quantize + O(nCells × dim)
      // centroid-scan kernels run ONCE per query vector — the
      // persist-before-multi-action convention; the frame is bounded
      // (queries × nProbe rows) by contract.
      .localCheckpoint()
    // Bounded driver state: distinct probe cells of a bounded query set.
    val cells = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val cand = index
      .where(col("cell").isin(cells.map(c => c: Any): _*)) // static → pruned scan
      .select(col("cand_id"), col("q").cast("array<double>").as("__candq"),
        col("n").as("__candn"), col("cell"))
    val scored = cand.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("qcosine", graft.functions.DetRound.det6(
        array_dot(col("__queryq"), col("__candq")) /
          (col("__queryn") * col("__candn"))))
      .select(col("query_id"), col("cand_id"), col("qcosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcosine").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("qcosine"), col("rank"))
  }

  /** ANN top-k via LSH buckets: candidates share a bucket with the query
    * in ≥ 1 table. Same output schema as bruteForceTopK; recall < 1 by
    * construction (measured in SimilaritySpec against the exact baseline). */
  def lshTopK(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 12, numTables: Int = 4): DataFrame = {
    val tables = (0 until numTables)
    def explodeBuckets(df: DataFrame, side: String): DataFrame = {
      val b = withBuckets(df, vecCol, numPlanes, numTables)
      val vAlias = if (side == "query") "__qv" else "__cv"
      b.select(col(idCol).as(s"${side}_id"),
        col(vecCol).cast("array<double>").as(vAlias),
        posexplode(array(tables.map(t => col(s"__bucket_$t")): _*))
          .as(Seq("__table", "__bucket")))
    }
    val cand = explodeBuckets(candidates, "cand")
    val q = explodeBuckets(queriesDf, "query")
    // A pair may collide in several tables: compute the (deterministic)
    // cosine FIRST and dedup on scalars only, so the distinct shuffles
    // (ids, cosine) rows — never the vectors. Re-scoring a multi-table
    // collision costs O(dim) CPU; shuffling two vectors costs 2×dim×8
    // bytes of network — CPU wins at any scale.
    val scored = cand.join(broadcast(q), Seq("__table", "__bucket"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", graft.functions.DetRound.det6(Dedup.cosineCol(col("__qv"), col("__cv"))))
      .select(col("query_id"), col("cand_id"), col("cosine"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rank"))
  }

  /** Nearest-anchor assignment: label every vector with the closest (by
    * cosine) of a small driver-side anchor set — the k-means/IVF
    * ASSIGNMENT step exposed as its own operator (topic bucketing by
    * exemplar documents, domain tagging, cluster inference under a
    * frozen model).
    *
    * Shape for scale: the anchors ride into the plan as array LITERALS,
    * so the whole assignment is ONE codegen'd projection per row —
    * |anchors| native array_cosine folds and a greatest() over
    * (cosine, -anchor_id) structs. Zero shuffle, zero join, no
    * broadcast table; 100 TB of vectors assign at scan speed.
    *
    * Ties (equal det6 cosine) go to the smaller anchor id: the struct
    * comparison takes the greater -id. Output: (idCol, cluster_id,
    * cosine[det6]). */
  /** RADIUS search: every candidate within `minCosine` of each query —
    * the fixed-threshold complement of top-k (dedup verification,
    * "everything semantically close to this exemplar" pulls). Exact
    * brute force over broadcast queries; at scale the IVF/LSH candidate
    * structures bound the scan exactly as for top-k, with the triangle
    * -inequality cell pruning of [[Dedup.embeddingNearDupPairs]] as the
    * no-false-negative path. */
  def radiusSearch(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, minCosine: Double): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val q = queriesDf.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    cand.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", graft.functions.DetRound.det6(
        Dedup.cosineCol(col("__qv"), col("__cv"))))
      .where(col("cosine") >= minCosine)
      .select(col("query_id"), col("cand_id"), col("cosine"))
  }

  /** The SCALE lane for [[radiusSearch]]: IVF cells bound the scan —
    * each query scores only the `nProbe` nearest cells' candidates
    * instead of the corpus, so cost is O(queries × probed-cell rows)
    * whatever the corpus size (and with an at-rest `partitionBy(cell)`
    * layout the probe is a pruned scan, the [[ivfQuantizedTopKAtRest]]
    * shape). With `nProbe = nCentroids` every candidate is scored and
    * the result PROVABLY equals [[radiusSearch]] (the driver entry runs
    * that configuration and shares its oracle); selective-probe recall
    * is measured in SimilaritySpec. Unlike top-k, radius results under
    * selective probing are a strict SUBSET of the exact answer (no
    * rank shifts — a scored pair passes the same threshold), so missed
    * mass is pure recall, never wrong rows. */
  def ivfRadiusSearch(
      candidates: DataFrame, queriesDf: DataFrame,
      idCol: String, vecCol: String, minCosine: Double,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val cs = trainIvfCentroids(candidates, vecCol, nCentroids, iters)
    val nearest = cellFinder(cs)
    val assignOne = udf { v: Seq[Double] => nearest(v, 1).head }
    val probeN = udf { v: Seq[Double] => nearest(v, nProbe) }
    val cand = candidates.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cell", assignOne(col("__cv")))
    val q = queriesDf.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__cell", explode(probeN(col("__qv"))))
    // candidate in exactly ONE cell × distinct probe cells → each pair
    // joins at most once (the ivfTopK argument) — no distinct needed.
    cand.join(broadcast(q), Seq("__cell"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", graft.functions.DetRound.det6(
        Dedup.cosineCol(col("__qv"), col("__cv"))))
      .where(col("cosine") >= minCosine)
      .select(col("query_id"), col("cand_id"), col("cosine"))
  }

  /** Mutual-kNN edges with IVF-BOUNDED candidate generation — the scale
    * lane the exact formulation in `queries/Ext.simKnnMutual` anchors:
    * the corpus is its own query set, every vector probes its `nProbe`
    * nearest cells, pairs sharing a probed cell score (cell-keyed
    * equi-join — never all-pairs), per-node top-k runs through
    * [[graft.operators.TopKPerKey]]'s k-bounded partial aggregation,
    * and the mutuality semi-join keeps (a, b) iff each ranks the other
    * within top-k. Shuffle after the capped agg is O(nodes × k).
    *
    * With `nProbe = nCentroids` every directed pair is a candidate, so
    * the result PROVABLY equals the exact mutual-kNN graph (the driver
    * entry runs that configuration and shares its oracle). The directed
    * pair (a→b) and (b→a) score identically bitwise: the dot-product
    * fold visits dimensions in the same order and double multiplication
    * commutes, so mutuality never breaks on rounding. */
  def ivfKnnMutual(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val cs = trainIvfCentroids(df, vecCol, nCentroids, iters)
    val nearest = cellFinder(cs)
    val assignOne = udf { v: Seq[Double] => nearest(v, 1).head }
    val probeN = udf { v: Seq[Double] => nearest(v, nProbe) }
    // Spread the corpus scan before the pair loop: the fixture parquet
    // is a couple of input splits, and the O(pairs × dim) cosine work
    // runs in the probe side's partitions — without this the whole
    // scoring loop lands on 1-2 tasks (measured 7.3 s → 2 s at sf0.1).
    val p = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val cand = base.select(col("__id").as("c"), col("__v").as("__cv"))
      .withColumn("__cell", assignOne(col("__cv")))
    val q = base.repartition(p)
      .select(col("__id").as("q"), col("__v").as("__qv"))
      .withColumn("__cell", explode(probeN(col("__qv"))))
    // No broadcast hint: locally Catalyst broadcasts the (small) cand
    // side and streams the repartitioned probes; at warehouse scale
    // both sides are corpus-sized and the same plan degrades to a
    // cell-keyed shuffle join whose parallelism is the cell count —
    // thousands of cells there, so no hint should pin either choice.
    val scored = cand.join(q, Seq("__cell"))
      .where(col("q") =!= col("c"))
      .withColumn("cosine", graft.functions.DetRound.det6(
        Dedup.cosineCol(col("__qv"), col("__cv"))))
      .select(col("q"), col("c"), col("cosine"))
    // tiny after the cap (nodes × k rows): checkpoint so the two
    // mutuality branches don't recompute the scoring join
    val tk = graft.operators.TopKPerKey(
      scored, Seq("q"), "cosine", "c", k).localCheckpoint()
    val ab = tk.where(col("q") < col("c"))
      .select(col("q").as("id_a"), col("c").as("id_b"), col("cosine"))
    val ba = tk.where(col("q") > col("c"))
      .select(col("c").as("id_a"), col("q").as("id_b"))
    ab.join(ba, Seq("id_a", "id_b"), "left_semi")
  }

  /** (cluster_id, cosine) columns appended; one codegen'd projection. */
  private def bestAnchorCol(
      vecCol: String, anchors: Seq[(Long, Seq[Double])]): Column = {
    require(anchors.size >= 2, s"need >= 2 anchors, got ${anchors.size}")
    val v = col(vecCol).cast("array<double>")
    greatest(anchors.map { case (aid, av) =>
      struct(
        graft.functions.DetRound.det6(
          Dedup.cosineCol(typedLit(av), v)).as("c"),
        lit(-aid).as("na"))
    }: _*)
  }

  def nearestAnchor(
      df: DataFrame, idCol: String, vecCol: String,
      anchors: Seq[(Long, Seq[Double])]): DataFrame =
    df.select(col(idCol), bestAnchorCol(vecCol, anchors).as("__best"))
      .select(col(idCol),
        (-col("__best.na")).as("cluster_id"),
        col("__best.c").as("cosine"))

  /** One Lloyd (k-means) iteration from the given anchors: assign every
    * vector to its nearest anchor ([[nearestAnchor]] — one codegen'd
    * scan), then recompute each centroid as the per-dimension mean of
    * its members.
    *
    * The mean uses FIXED-POINT accumulation (det6-rounded components
    * cast to decimal(18,6), summed exactly) so the distributed result is
    * ORDER-INDEPENDENT — bit-reproducible across partitionings and
    * replayable by any engine, where a naive double sum would depend on
    * Spark's partition/merge order (same trick as the z-score / anomaly
    * moments). Shuffle volume after map-side partial aggregation is
    * O(partitions × |anchors| × dim), independent of row count.
    *
    * Output: (cluster_id, dim, centroid[det6]) — |anchors| × dim rows. */
  def kmeansStep(
      df: DataFrame, idCol: String, vecCol: String,
      anchors: Seq[(Long, Seq[Double])]): DataFrame = {
    // Assignment and member vector stay in ONE projection — no join
    // back (an id-keyed self-join would shuffle the whole vector set
    // twice for data the scan already has in hand).
    df.select(
        (-bestAnchorCol(vecCol, anchors).getField("na")).as("cluster_id"),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col("cluster_id"), posexplode(col("__v")).as(Seq("dim", "__x")))
      .groupBy(col("cluster_id"), col("dim"))
      .agg(
        sum(graft.functions.DetRound.det6(col("__x")).cast("decimal(18,6)"))
          .as("__s"),
        count(lit(1)).as("__n"))
      .select(col("cluster_id"), col("dim"),
        graft.functions.DetRound.det6(
          col("__s").cast("double") / col("__n")).as("centroid"))
  }
}
