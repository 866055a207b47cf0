package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a grouped rollup (counts +
  * sums per key) at rest and fold each new delta batch into it WITHOUT
  * re-reading history — the materialized-view maintenance loop every
  * ingest pipeline runs between arrivals. Cost per apply is
  * O(|state| + |delta|): the delta is partially aggregated first (its
  * map-side combine collapses it to one row per touched group), then
  * one equi-join merges it into the state. Recomputing from scratch is
  * O(|history|) and at 100 TB history that is the difference between a
  * minutes-cadence rollup and a nightly one.
  *
  * State schema: the group columns plus `n_rows` and `sum_<c>` per
  * measure — every lane is a COMMUTATIVE MONOID (longsum / doublesum),
  * so batch application order cannot change the result and
  * `combine(combine(s, d1), d2) == combine(s, d1 ∪ d2)` (spec-pinned).
  * Derived, non-additive views (avg = sum/n) are computed AT READ TIME
  * from the additive state, never stored.
  *
  * Sums accumulate as DECIMAL(38,6): double-summing partial states
  * would make the result depend on the merge tree's shape, and the
  * whole point of at-rest state is bit-stable replay.
  */
object IncrementalAgg {

  /** Partially aggregate a raw batch to state shape: one row per group,
    * `n_rows` + decimal `sum_<c>` per measure. Used for both the
    * initial state build and each delta. */
  def partial(
      batch: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "IncrementalAgg: no group keys")
    require(measures.nonEmpty, "IncrementalAgg: no measures")
    val aggs = count(lit(1)).as("n_rows") +:
      measures.map(c =>
        sum(col(c).cast("decimal(38,6)")).as(s"sum_$c"))
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a partially-aggregated delta into state: one full-outer
    * equi-join on the group keys (broadcastable when the delta touches
    * few groups — AQE decides), additive lanes coalesced and added.
    * Both inputs must be in state shape (same keys + lanes). */
  def combine(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val lanes = state.columns.filterNot(keys.contains).toSeq
    require(lanes.contains("n_rows"),
      "IncrementalAgg: state lacks n_rows — not in state shape?")
    require(delta.columns.sorted.sameElements(state.columns.sorted),
      s"IncrementalAgg: delta columns ${delta.columns.mkString(",")} " +
        s"!= state columns ${state.columns.mkString(",")}")
    val s = state.alias("__s")
    val d = delta.alias("__d")
    val on = keys.map(k => col(s"__s.$k") <=> col(s"__d.$k"))
      .reduce(_ && _)
    s.join(d, on, "full_outer").select(
      keys.map(k =>
        coalesce(col(s"__s.$k"), col(s"__d.$k")).as(k)) ++
      lanes.map { c =>
        val z = if (c == "n_rows") lit(0L).cast("long")
                else lit(0).cast("decimal(38,6)")
        (coalesce(col(s"__s.$c"), z) + coalesce(col(s"__d.$c"), z)).as(c)
      }: _*)
  }

  /** Read-time view over additive state: the sums as doubles plus the
    * derived mean per measure (deterministic 1e-6 rounding so the
    * division is engine-portable). */
  def withDerived(state: DataFrame, measures: Seq[String]): DataFrame =
    measures.foldLeft(state) { (df, c) =>
      df.withColumn(s"sum_$c", col(s"sum_$c").cast("double"))
        .withColumn(s"avg_$c",
          floor(col(s"sum_$c") / col("n_rows") * 1e6 + 0.5) / 1e6)
    }

  /** Name of the applied-transaction sidecar INSIDE the state dir (the
    * `_` prefix keeps parquet readers from seeing it as data). Riding
    * inside the dir means the txn list and the state it describes swap
    * ATOMICALLY in the same rename — they can never disagree. */
  private val TxnsName = "_graft_txns"

  /** Maintain the state AT REST: read the snapshot at `path`, fold the
    * (raw) delta batch in, swap via [[SnapshotMerge.applyAtRest]]'s
    * temp+rename discipline — crash-repairing on entry.
    *
    * EXACTLY-ONCE under replay requires `txnId` (pass the foreachBatch
    * batchId): each applied id is recorded in a sidecar that swaps
    * atomically with the state, and a replayed id no-ops. Without a
    * txnId the fold is only crash-consistent / at-least-once — a
    * micro-batch replayed after a successful apply but before the
    * stream checkpoint advances would double-count; callers omitting
    * it must dedup batches upstream. */
  def applyAtRest(
      spark: SparkSession, path: String, delta: DataFrame,
      keys: Seq[String], measures: Seq[String],
      txnId: Option[String] = None): Unit =
    applyPartialAtRest(spark, path,
      () => partial(delta, keys, measures), keys, txnId,
      dropZeroGroups = false)

  /** The shared at-rest fold over an ALREADY state-shaped delta (lazy,
    * so a replayed-txn no-op never builds the plan). `dropZeroGroups`
    * removes groups whose count lane reaches exactly zero AFTER the
    * combine — the signed ([[syncChangesFromTable]]) fold's way of
    * retiring fully-deleted groups (a state group at count zero has
    * exactly-zero decimal sums too). The DELTA itself is never
    * filtered in the combine path: a signed window can net n_rows = 0
    * for a group with a NONZERO sum delta — an update-only window's
    * delete/insert pairs — and dropping it would silently lose the
    * value change (caught by the sf0.01 oracle before it shipped). */
  private def applyPartialAtRest(
      spark: SparkSession, path: String, mkDelta: () => DataFrame,
      keys: Seq[String], txnId: Option[String],
      dropZeroGroups: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    require(txnId.forall(t => t.nonEmpty && !t.exists(_ <= ' ')),
      s"txnId must be non-empty with no whitespace: $txnId")
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(src.getParent, s".${src.getName}__agg_tmp")
    val bak = new Path(src.getParent, s".${src.getName}__agg_old")
    // Crash repair first (the SnapshotMerge discipline): missing src
    // with a backup → roll back; stale backup/tmp → clear.
    if (!fs.exists(src) && fs.exists(bak))
      require(fs.rename(bak, src), s"zone recovery: $bak -> $src failed")
    else if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val applied = appliedTxns(fs, src)
    if (txnId.exists(applied.contains)) return // replayed batch: no-op
    val d = mkDelta()
    if (!fs.exists(src)) {
      // init: the delta IS the state — here n_rows = 0 does imply
      // zero sums (every insert the window later deleted canceled
      // value-exactly), so the retirement filter is safe
      (if (dropZeroGroups) d.where(col("n_rows") =!= 0L) else d)
        .write.parquet(tmp.toString)
      txnId.foreach(t => writeTxns(fs, tmp, Seq(t)))
      require(fs.rename(tmp, src), s"agg init: $tmp -> $src failed")
    } else {
      val merged = combine(spark.read.parquet(path), d, keys)
      (if (dropZeroGroups) merged.where(col("n_rows") =!= 0L)
       else merged).write.parquet(tmp.toString)
      // The applied-id list ALWAYS carries forward into the new state,
      // even when this apply has no txnId of its own: dropping it would
      // let a later replay of an ALREADY-APPLIED id double-count (the
      // mixed txn/non-txn degradation). Bounded to the most recent ids —
      // foreachBatch replays only ever re-offer recent batchIds, so an
      // unbounded one-line-per-batch sidecar is pure growth. The most
      // recent vtsync_* record survives the bound unconditionally: it
      // IS [[syncFromTable]]'s watermark, and evicting it would brick
      // the synced view (wm=None on existing state refuses).
      val all = applied ++ txnId
      val bounded = all.takeRight(MaxTrackedTxns)
      val forward =
        if (bounded.exists(_.startsWith("vtsync_")) ||
            !all.exists(_.startsWith("vtsync_"))) bounded
        else all.filter(_.startsWith("vtsync_")).last +: bounded
      if (forward.nonEmpty) writeTxns(fs, tmp, forward)
      require(fs.rename(src, bak), s"agg swap: $src -> $bak failed")
      require(fs.rename(tmp, src), s"agg swap: $tmp -> $src failed")
      fs.delete(bak, true)
    }
  }

  /** Sidecar bound: replays only ever re-offer recent batch ids (the
    * foreachBatch crash window is one batch deep; a generous margin
    * covers manual backfills), so the applied list keeps a tail, not
    * the full history. */
  private val MaxTrackedTxns = 10000

  /** Keep the rollup in LOCK-STEP with a [[VersionedTable]] — the
    * materialized-view maintenance loop, one call: resolve the
    * table's latest version, fold in exactly the rows that landed
    * since the last sync (the manifest FILE DIFF — O(delta), never a
    * history rescan), and record the advance. Returns the synced
    * window `(fromVersion, toVersion)`, or None when already current.
    *
    * EXACTLY-ONCE WITHOUT A WATERMARK FILE: the watermark IS the txn
    * record. Each sync applies with txnId `vtsync_<from>_<to>`, and
    * the next sync derives its `from` as the max `<to>` across the
    * applied-txn sidecar — which swaps ATOMICALLY with the state it
    * describes, so no crash window can separate "state advanced" from
    * "watermark advanced" (the bug every hand-rolled poller has). A
    * replayed window no-ops through the normal txn check.
    *
    * First sync (no vtsync id yet) initializes from a FULL read of the
    * current version; later syncs require the window to be append-only
    * — a delete/merge/compaction in it refuses loudly via
    * `readAppendsSince` (a rollup maintained by adds alone cannot
    * absorb removals; rebuild the state from a fresh init instead),
    * and an [[VersionedTable.expire]]d watermark raises the
    * distinguishable re-baseline signal. */
  def syncFromTable(spark: SparkSession, statePath: String,
      tablePath: String, keys: Seq[String],
      measures: Seq[String]): Option[(Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val src = new Path(statePath)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val wm = appliedTxns(fs, src).filter(_.startsWith("vtsync_"))
      .map(_.split('_')(2).toInt).maxOption
    val latest = VersionedTable.latestVersion(spark, tablePath)
      .getOrElse(throw new IllegalStateException(
        s"no committed versions at $tablePath"))
    if (wm.exists(_ >= latest)) return None
    // a state that exists but carries no sync record is FOREIGN (built
    // by direct applyAtRest calls) — initializing on top of it would
    // double-count; the guard is loud, not silent corruption
    require(wm.nonEmpty || !fs.exists(src),
      s"syncFromTable: $statePath holds state with no vtsync record — " +
        "it was not built by syncFromTable; use a fresh statePath")
    val from = wm.getOrElse(-1)
    val delta =
      if (from < 0) VersionedTable.read(spark, tablePath, Some(latest))
      else VersionedTable.readAppendsSince(spark, tablePath, from,
        Some(latest))
    applyAtRest(spark, statePath, delta, keys, measures,
      txnId = Some(s"vtsync_${from}_$latest"))
    Some((from, latest))
  }

  /** [[syncFromTable]] driven by the CHANGE FEED instead of the
    * appends diff — classic incremental view maintenance for
    * distributive aggregates: count/sum lanes form a GROUP, not just a
    * monoid, so a delete folds in as its NEGATION and the rollup
    * follows the table through deletes, merges, and even overwrites —
    * the windows [[syncFromTable]] must refuse. Inserts add (+1,
    * +value), deletes subtract (−1, −value); an update contributes its
    * delete/insert pair, netting the value change; a group whose count
    * reaches zero is retired from the state (its exact-decimal sums
    * are zero too). Cost is O(|changes in the window|) — the manifest
    * diff, never a table rescan.
    *
    * Same watermark protocol and exactly-once story as
    * [[syncFromTable]] (`vtsync_<from>_<to>` txn records, atomic with
    * the state); the two flavors are interchangeable on one state —
    * both fold exactly the window `(from, to]`. The only window it
    * refuses is one whose change feed is itself unrecoverable (an
    * expired predecessor — [[VersionedTable.VersionExpiredException]]). */
  def syncChangesFromTable(spark: SparkSession, statePath: String,
      tablePath: String, keys: Seq[String],
      measures: Seq[String]): Option[(Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val src = new Path(statePath)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val wm = appliedTxns(fs, src).filter(_.startsWith("vtsync_"))
      .map(_.split('_')(2).toInt).maxOption
    val latest = VersionedTable.latestVersion(spark, tablePath)
      .getOrElse(throw new IllegalStateException(
        s"no committed versions at $tablePath"))
    if (wm.exists(_ >= latest)) return None
    require(wm.nonEmpty || !fs.exists(src),
      s"syncChangesFromTable: $statePath holds state with no vtsync " +
        "record — it was not built by a table sync; use a fresh statePath")
    val from = wm.getOrElse(-1)
    applyPartialAtRest(spark, statePath,
      () => signedPartial(VersionedTable.readChangesRange(spark,
        tablePath, from, Some(latest)), keys, measures),
      keys, txnId = Some(s"vtsync_${from}_$latest"),
      dropZeroGroups = true)
    Some((from, latest))
  }

  /** State-shaped SIGNED aggregate of a change feed: deletes count −1
    * and subtract their (exact decimal) measure values. Null measure
    * values contribute nothing on either sign — matching [[partial]]'s
    * null-skipping sums, so insert/delete pairs always cancel. */
  private def signedPartial(changes: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val del = col("_change_type") === "delete"
    val aggs = sum(when(del, lit(-1L)).otherwise(lit(1L))).as("n_rows") +:
      measures.map(c => sum(when(del, -col(c).cast("decimal(38,6)"))
        .otherwise(col(c).cast("decimal(38,6)"))).as(s"sum_$c"))
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def appliedTxns(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, TxnsName)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeTxns(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, ids: Seq[String]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, TxnsName), true)
    try out.write(ids.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }
}
