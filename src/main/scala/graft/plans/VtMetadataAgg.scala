package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.VersionedTable
import graft.sources.VtTable

/** METADATA-ONLY AGGREGATES over versioned catalog tables: a whole-
  * table `SELECT count(*)` (and `min`/`max` of a stats-indexed
  * column) folds to a [[LocalRelation]] computed from the version's
  * manifest — zero data files opened. At 100 TB that is the
  * difference between a multi-minute 800k-file scan and a
  * milliseconds-scale manifest read (the Delta/Iceberg
  * metadata-query posture); the manifest row counts and footer-
  * harvested spans are exact by construction, so this is never an
  * approximation.
  *
  * STRICTLY EXACT-OR-UNTOUCHED:
  *   - only a no-grouping [[Aggregate]] whose every output is a
  *     non-distinct, unfiltered `count(1)`/`count(*)`, or a
  *     `min`/`max` of a plain relation column, over (Projects of)
  *     the bare relation — any Filter/join/expression in between
  *     blocks the rewrite (a Project never changes row counts);
  *   - `count` answers via [[VersionedTable.countRows]]: exact on
  *     DV'd versions too (live rows = physical − masked), `None`
  *     (pre-v3 unknown row counts) leaves the plan alone;
  *   - `min`/`max` answer via [[VersionedTable.statsSpan]], which
  *     returns a span only when EVERY row-bearing file recorded
  *     comparable stats for the column and no deletion vector could
  *     hide an extremum — otherwise the scan runs; restricted to
  *     Long/Double/String columns (the manifest's normalized span
  *     types — an identity mapping back into the Catalyst type) on
  *     versions with no scan refusal (column mapping renames would
  *     misalign logical names against physical stats keys; the
  *     lookup would miss and answer None anyway — the guard makes
  *     the contract explicit);
  *   - post-pushdown `DataSourceV2ScanRelation`s are never matched:
  *     a scan may carry pushed predicates this rule cannot see.
  *
  * Registered BEFORE [[VtMaskedScanRewrite]] so a DV'd version's
  * whole-table count folds from metadata instead of planning the
  * masking read. */
object VtMetadataAgg extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformWithSubqueries {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.nonEmpty =>
        stripToVt(child) match {
          case Some(t) =>
            foldAll(agg, aggExprs, t) match {
              case Some(rows) => LocalRelation(agg.output, rows)
              case None => agg
            }
          case None => agg
        }
    }

  /** The relation beneath row-count-preserving wrappers, when it is a
    * versioned catalog table. Handles both the pre-pushdown
    * [[DataSourceV2Relation]] (construction-time rule injection) and
    * the post-pushdown [[DataSourceV2ScanRelation]] (runtime
    * `extraOptimizations` fire after V2 pushdown) — the latter ONLY
    * when its parquet scan provably carries no pushed/partition/data
    * filters (a pushed predicate would make the manifest count an
    * over-count). */
  private def stripToVt(p: LogicalPlan): Option[VtTable] = p match {
    case Project(_, c) => stripToVt(c)
    case SubqueryAlias(_, c) => stripToVt(c)
    case r: DataSourceV2Relation => r.table match {
      case t: VtTable => Some(t)
      case _ => None
    }
    case s: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation =>
      // a guarded scan (DV'd/mapped version) proxies the real parquet
      // scan — unwrap to read its pushed-filter state (folding a
      // count from live-row metadata is exactly what the guard's
      // refusal wants instead of a lying file scan)
      val real = s.scan match {
        case g: graft.sources.VtGuardedScan => g.vtUnderlying()
        case other => other
      }
      val unfiltered = real match {
        case p: org.apache.spark.sql.execution.datasources.v2
            .parquet.ParquetScan =>
          p.pushedFilters.isEmpty && p.partitionFilters.isEmpty &&
            p.dataFilters.isEmpty
        case _ => false
      }
      if (!unfiltered) None
      else s.relation.table match {
        case t: VtTable => Some(t)
        case _ => None
      }
    case _ => None
  }

  /** Fold every aggregate expression from the manifest, or None if
    * ANY of them is not provably answerable from metadata. */
  private def foldAll(agg: Aggregate, aggExprs: Seq[NamedExpression],
      t: VtTable): Option[Seq[InternalRow]] = {
    val spark = SparkSession.active
    // one manifest read answers every expression (segment-cached)
    lazy val count: Option[Long] =
      try VersionedTable.countRows(spark, t.vtPath, Some(t.vtVersion))
      catch { case scala.util.control.NonFatal(_) => None }
    def span(col: String): Option[Option[(Any, Any)]] =
      if (t.vtScanRefusal.nonEmpty) None
      else try VersionedTable.statsSpan(spark, t.vtPath, col,
        Some(t.vtVersion))
      catch { case scala.util.control.NonFatal(_) => None }
    val values = aggExprs.map {
      case Alias(AggregateExpression(
          Count(Seq(Literal(_, _))), Complete, false, None, _), _) =>
        count.map(n => n: Any)
      case Alias(AggregateExpression(
          Min(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) =>
        span(a.name).map(_.map(s => toCatalyst(s._1, a)).orNull)
      case Alias(AggregateExpression(
          Max(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) =>
        span(a.name).map(_.map(s => toCatalyst(s._2, a)).orNull)
      case _ => None
    }
    if (values.exists(_.isEmpty)) None
    else Some(Seq(InternalRow.fromSeq(values.map(_.get))))
  }

  /** Span values are normalized to Long/Double/String in the
    * manifest; only columns whose Catalyst type maps back identically
    * are foldable. */
  private def spanType(a: Attribute): Boolean = a.dataType match {
    case LongType | DoubleType | StringType => true
    case _ => false
  }

  private def toCatalyst(v: Any, a: Attribute): Any = (v, a.dataType) match {
    case (l: Long, LongType) => l
    case (d: Double, DoubleType) => d
    case (s: String, StringType) => UTF8String.fromString(s)
    case _ => throw new IllegalStateException(
      s"span value $v does not fit column ${a.name}: ${a.dataType}")
  }

  /** Idempotently add the rewrite to a LIVE session, ahead of the
    * masked-scan rewrite (construction-time sessions get the same
    * order via [[graft.GraftExtensions]]). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        this +: spark.experimental.extraOptimizations
}
