package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan-time scale linter — custom-operator ladder step (c): a
  * `Rule[LogicalPlan]` that TRANSFORMS NOTHING but flags the plan
  * shapes that are correct on a laptop and catastrophic on a cluster:
  *
  *   - `unpartitioned-window`: `Window.orderBy(..)` with no partition
  *     spec — "WindowExec: No Partition Defined": every row moves to ONE
  *     reducer. The engine's own queries rank via GlobalRank instead;
  *     this catches user queries that don't.
  *   - `cross-join`: an explicit CROSS or condition-less join — O(|L|×|R|)
  *     output. Sometimes intentional (tiny broadcast side, e.g. the
  *     exact ANN baseline); the lint is ADVISORY, it never blocks.
  *   - `unclustered-partitioned-write`: `partitionBy(...)` whose input
  *     is not clustered on the partition columns — every task then
  *     writes a file into EVERY partition directory (tasks × partitions
  *     small files; found in the wild on this engine's own at-rest ANN
  *     index, where it measurably erased the pruning benefit). The fix
  *     is a `repartition(partitionCols)` before the write.
  *
  * Findings are recorded (bounded, deduplicated) and log-warned at plan
  * time — failing in the optimizer beats failing three hours into a
  * 1000-executor stage. Attach at build time via
  * `spark.sql.extensions=graft.GraftExtensions` or at runtime with
  * `ScaleLint.attach(spark)`.
  */
object ScaleLint extends Rule[LogicalPlan] {

  case class Finding(kind: String, detail: String)

  private val MaxFindings = 1000
  private val buf =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Finding]()

  def findings: Seq[Finding] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }
  def clear(): Unit = buf.clear()

  /** Runtime attachment (public API; survives session reuse). */
  def attach(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def record(kind: String, detail: String): Unit = {
    val f = Finding(kind, detail)
    if (buf.size < MaxFindings && buf.add(f))
      logWarning(s"[scale-lint] $kind: $detail")
  }

  /** Remove a previous [[attach]]. */
  def detach(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq this)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // subqueriesAll: EXISTS/IN/scalar subquery plans hide the exact
    // shapes this lint exists for; plain foreach never visits them.
    (plan +: plan.subqueriesAll).foreach(_.foreach {
      case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty =>
        record("unpartitioned-window",
          s"window [${w.windowExpressions.map(_.name).mkString(", ")}] " +
            "orders ALL rows on one reducer; partition it or use GlobalRank")
      case j: Join if j.joinType == Cross || j.condition.isEmpty =>
        record("cross-join",
          s"${j.joinType} join with no condition multiplies " +
            "|left| x |right|; ensure one side is provably tiny")
      case cmd: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
          if cmd.partitionColumns.nonEmpty =>
        val pNames = cmd.partitionColumns.map(_.name.toLowerCase).toSet
        val clustered = cmd.query.exists {
          case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
            r.partitionExpressions
              .flatMap(_.references.map(_.name.toLowerCase))
              .toSet.intersect(pNames).nonEmpty
          case r: org.apache.spark.sql.catalyst.plans.logical.RebalancePartitions =>
            r.partitionExpressions
              .flatMap(_.references.map(_.name.toLowerCase))
              .toSet.intersect(pNames).nonEmpty
          case _ => false
        }
        if (!clustered) record("unclustered-partitioned-write",
          s"partitionBy(${cmd.partitionColumns.map(_.name).mkString(", ")}) " +
            "without clustering the input on those columns writes " +
            "tasks x partitions small files; repartition(partitionCols) first")
      case _ =>
    })
    plan
  }
}
