package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (power iteration) in FIXED-POINT long arithmetic.
  *
  * The reference has no graph surface at all (SURVEY §1.1 "graphs:
  * absent"); the engine already ships connected components for dedup
  * clustering, and PageRank is the other canonical iterative-graph
  * workload a curation pipeline wants (rank sources/domains by citation
  * structure, rank parts by co-purchase centrality).
  *
  * Design for 100 TB:
  *   - Edges are joined with their out-degree ONCE and persisted
  *     pre-partitioned on `src`; every iteration's join then reuses that
  *     partitioning, so the per-iteration shuffle is only the O(nodes)
  *     rank table — never the O(edges) edge table.
  *   - Each iteration is one join + one partial-aggregated groupBy; the
  *     rank frame is `localCheckpoint`ed per iteration so the lineage
  *     (and the plan Catalyst must optimize) stays flat instead of
  *     growing exponentially across 10 iterations.
  *   - No driver-side state beyond the node count (one 1-row aggregate).
  *
  * Cross-engine determinism: ranks are scaled longs (fixed-point at
  * `scale` = 1e12). Every operation is integer arithmetic — floor
  * division for the per-edge contribution `r div outdeg`, integer
  * damping `(85·Σ) div 100` — so summation order cannot perturb the
  * result and the DuckDB oracle (same unrolled integer recurrence)
  * hash-matches bit-for-bit. The floor losses conservatively shrink
  * total mass (≤ outdeg per node per iteration at scale 1e12 — relative
  * error < 1e-6); ranking order is unaffected for any realistic graph.
  *
  * Dangling nodes: callers pass a SYMMETRIC edge set (or otherwise
  * guarantee every node has outdeg ≥ 1); nodes outside the edge set are
  * out of scope of the rank universe.
  */
object PageRank {

  /** @param edges DataFrame with long columns `src`, `dst` (made
    *              distinct here; self-loops are the caller's choice)
    * @param checkpointDir reliable-checkpoint path (HDFS/object
    *              store). Default `None` truncates per-iteration
    *              lineage with `localCheckpoint` — executor-local
    *              blocks, fastest, but NOT recoverable: one lost or
    *              preempted executor fails the job mid-iteration.
    *              Set on real clusters to pay a distributed write
    *              per iteration and survive executor loss. Value-
    *              identical either way (spec-locked).
    * @return (node: long, r: long) — fixed-point rank at `scale` */
  def run(edges: DataFrame, iterations: Int,
          scale: Long = 1000000000000L,
          checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    checkpointDir.foreach(
      edges.sparkSession.sparkContext.setCheckpointDir)
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    // One-time edge+degree co-location; iterations reuse this layout.
    // Exchange audit (2 total, down from 4): distinct keeps its own
    // (src, dst) exchange so raw duplicate edges dedup MAP-SIDE before
    // crossing the wire; the explicit repartition on src then feeds
    // BOTH the degree aggregate and the join probe side — the two
    // consumers share one ReusedExchange, and the join's output is
    // already hash(src)-partitioned so no post-join repartition.
    val er = e.repartition(col("src"))
    val deg = er.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e2a = er.join(deg, "src").persist()
    // Node count + initial ranks come OFF THE CACHE (hash(src)
    // partitioning satisfies the distinct's clustering — no exchange),
    // so the edge pipeline (upstream joins, dedup) executes exactly
    // once instead of once per consumer.
    val n = e2a.select(col("src")).distinct().count()
    if (n == 0) { // empty graph → empty ranks, same schema (everyday
      e2a.unpersist() // event at scale; never a crash)
      return deg.select(col("src").as("node"), lit(0L).as("r"))
    }
    // Scale-adaptive co-location width: the first repartition runs at
    // the configured shuffle width (unknowable size), but the CACHED
    // relation's byte size is now exact, so re-layout ONCE to a width
    // derived from the data, clamped to the configured shuffle width —
    // the iterations then schedule tasks proportional to the DATA, not
    // to a constant tuned for either local mode or the cluster. The
    // per-partition target is advisoryPartitionSize / 8: an
    // iteration-hot cache is re-read `iterations` times, so its
    // straggler tail and per-task overhead are paid `iterations` times
    // too — measured on the bench fixture (57 MB cache, 32 cores),
    // width 8 runs 10 iterations in ~3.5-4.4 s vs ~5-12 s at width 32
    // and worse still at width 1 (one-core iterations). One extra
    // cache pass buys the re-layout; at scale bytes/(advisory/8)
    // exceeds the shuffle width and the re-layout is skipped entirely.
    val sess = e2a.sparkSession
    val advisory = math.max(8L, sess.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val target = advisory / 8
    val maxP = sess.sessionState.conf.numShufflePartitions
    val cachedBytes =
      e2a.queryExecution.optimizedPlan.stats.sizeInBytes
    val p = BigInt(1).max(
      (cachedBytes + target - 1) / target).min(BigInt(maxP)).toInt
    val e2 =
      if (p >= maxP) e2a
      else {
        val relaid = e2a.repartition(p, col("src")).persist()
        relaid.count(): Unit // materialize before dropping the source
        e2a.unpersist()
        relaid
      }
    val nodes = e2.select(col("src")).distinct()
    val init = scale / n // Scala Long division == DuckDB // (positive)
    val base = (15L * scale / 100L) / n
    var ranks = nodes.select(col("src").as("node"), lit(init).as("r"))
    for (_ <- 1 to iterations) {
      // SHUFFLE_HASH on the O(nodes) rank side: sort-merge would
      // re-sort the cached O(edges) side EVERY iteration (the cache
      // holds partitioning, not ordering); a per-partition hash build
      // of the rank slice costs O(nodes/partitions) memory and skips
      // both sorts. The edge side's cached hash(src) partitioning is
      // reused, so the only per-iteration shuffle stays the rank table.
      ranks = e2.join(ranks.hint("SHUFFLE_HASH"),
          e2("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("insum"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * insum) div 100")).as("r"))
      ranks = ckpt(ranks)
    }
    e2.unpersist()
    ranks
  }
}
