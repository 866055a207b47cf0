package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style batch upsert: apply a change set (insert / update /
  * delete rows) to a base snapshot, producing the next snapshot — the
  * MERGE INTO a training pipeline runs against its metadata tables
  * (shard registries, label stores, curation verdicts) between runs.
  * The engine has no transactional table format by design (snapshots
  * are immutable parquet); this operator is the deterministic
  * functional merge over them.
  *
  * Contract: `changes` carries the base's data columns plus `opCol` ∈
  * {"I", "U", "D"} and AT MOST ONE row per key (collapsing multiple
  * ops per key into the latest is the upstream CDC log's job — a
  * TopKPerKey on a sequence number). The one-row-per-key contract is
  * ENFORCED: a duplicate key in `changes` fails the job with a clear
  * error instead of silently fanning out the join. I and U are both "take the change
  * row's values" (an I for an existing key behaves as U — idempotent
  * replay); D drops the key. Rows with any OTHER op value (including
  * null) are malformed CDC input and are DROPPED before the join —
  * without the filter a null-op row for an absent key would survive
  * the full-outer join on the `!touched` branch and emit a phantom
  * all-NULL row into the snapshot.
  *
  * Scale shape: ONE hash shuffle of each side on the key (a plain
  * full-outer equi-join — broadcastable when the change set is small,
  * which AQE decides), then a codegen'd per-column coalesce
  * projection. No windows, no driver state. Unchanged base rows flow
  * through untouched, so cost tracks max(|base|, |changes|), never
  * their product.
  */
object SnapshotMerge {

  def apply(
      base: DataFrame, changes: DataFrame,
      keyCol: String, opCol: String = "op"): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(keyCol), s"base lacks key column $keyCol")
    require(changes.columns.contains(opCol),
      s"changes lacks op column $opCol")
    require(dataCols.forall(changes.columns.contains),
      "changes must carry every base data column")
    val b = base.alias("__b")
    // Loud guard on the AT-MOST-ONE-row-per-key contract: a duplicate
    // key would fan out the full-outer join and silently corrupt the
    // snapshot. One window count over the (small) change set, keyed the
    // same as the join, and assert_true fails the job executor-side the
    // moment a violation is seen — no extra driver action.
    import org.apache.spark.sql.expressions.Window
    val c = changes.where(col(opCol).isin("I", "U", "D"))
      .withColumn("__keyCnt",
        count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__chk", assert_true(col("__keyCnt") === 1,
        concat(lit(s"SnapshotMerge: duplicate key in changes for $keyCol="),
          col(keyCol).cast("string"))))
      .where(col("__chk").isNull)
      .drop("__keyCnt", "__chk")
      .alias("__c")
    val joined = b.join(c,
      col(s"__b.$keyCol") === col(s"__c.$keyCol"), "full_outer")
    val touched = col(s"__c.$opCol").isNotNull
    joined
      .where(!touched || col(s"__c.$opCol") =!= "D") // deletes drop out
      .select(dataCols.map(n =>
        when(touched, col(s"__c.$n")).otherwise(col(s"__b.$n")).as(n)): _*)
  }

  /** MERGE INTO an at-rest parquet snapshot: read, merge, write to a
    * temp sibling, swap with two renames (the [[Compact]] discipline —
    * racing readers see the old complete snapshot or the new one,
    * never a half-written mix). The write job reads the CURRENT
    * snapshot files lazily while they are still in place; the swap is
    * pure metadata afterwards. This is the `foreachBatch` body for a
    * STREAM-maintained snapshot (state lives in the snapshot itself,
    * no state store — the SnapshotMerge twin of the streaming ANN
    * index maintenance). Sequential batch applies compose: merge(
    * merge(base, b1), b2) — each batch's at-most-one-op-per-key
    * contract is enforced per apply.
    *
    * Crash recovery: the two-rename swap has a window (after
    * `src -> bak`, before `tmp -> src`) where NO snapshot sits at
    * `path`. Because this runs inside streaming `foreachBatch` where
    * restarts are routine, every call first repairs any crash state:
    * a missing `src` with `bak` present is rolled BACK (bak -> src,
    * stale tmp deleted) and the merge re-runs — correct under
    * foreachBatch replay semantics, since the micro-batch's offsets
    * only commit after the batch body returns, so the restarted query
    * re-delivers the same change set. A leftover `bak` alongside a
    * live `src` (crash after the second rename) is just deleted. */
  def applyAtRest(
      spark: org.apache.spark.sql.SparkSession, path: String,
      changes: DataFrame, keyCol: String, opCol: String = "op"): Unit = {
    import org.apache.hadoop.fs.Path
    val src = new Path(path)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(src.getParent, s".${src.getName}__snap_tmp")
    val bak = new Path(src.getParent, s".${src.getName}__snap_old")
    if (!fs.exists(src)) {
      require(fs.exists(bak),
        s"SnapshotMerge: no snapshot at $src and no backup at $bak — " +
          "nothing to recover; was the path ever initialized?")
      require(fs.rename(bak, src), s"snapshot recovery: $bak -> $src failed")
    } else if (fs.exists(bak)) {
      fs.delete(bak, true) // crash after swap completed: stale backup
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    apply(spark.read.parquet(path), changes, keyCol, opCol)
      .write.parquet(tmp.toString)
    require(fs.rename(src, bak), s"snapshot swap: $src -> $bak failed")
    require(fs.rename(tmp, src), s"snapshot swap: $tmp -> $src failed")
    fs.delete(bak, true)
  }
}
