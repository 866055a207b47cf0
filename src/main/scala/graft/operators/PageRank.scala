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
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // One-time edge+degree co-location; iterations reuse this layout.
    val e2 = e.join(deg, "src").repartition(col("src")).persist()
    val n = deg.count() // 1-row-per-node agg count: O(1) to the driver
    if (n == 0) { // empty graph → empty ranks, same schema (everyday
      e2.unpersist() // event at scale; never a crash)
      return deg.select(col("src").as("node"), lit(0L).as("r"))
    }
    val init = scale / n // Scala Long division == DuckDB // (positive)
    val base = (15L * scale / 100L) / n
    var ranks = deg.select(col("src").as("node"), lit(init).as("r"))
    for (_ <- 1 to iterations) {
      ranks = e2.join(ranks, e2("src") === ranks("node"))
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
