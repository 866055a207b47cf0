package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Attribute, AttributeReference, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, NamedExpression, Not, Or, StartsWith}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DateType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.VersionedTable
import graft.operators.VersionedTable.{ExactIn, ExactIsNull, ExactNotIn, ExactNotNull, ExactOr, ExactPred, ExactRange}
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
  *     non-distinct, unfiltered `count(1)`/`count(*)`, `count(col)`
  *     (= Σ per file rows − nulls, from the manifest's null counts),
  *     or a `min`/`max` of a plain relation column, over (Projects
  *     of) the bare relation or exactly one Filter above it — any
  *     join/expression in between blocks the rewrite (a Project
  *     never changes row counts);
  *   - a WHERE folds when EVERY conjunct translates to exact
  *     file-level predicates — ranges, IN, IS NOT NULL, and
  *     DISJUNCTIONS of those ([[VersionedTable.ExactOr]]: a file is
  *     all-in when some OR-alternative provably covers its every
  *     row) — all-in files answer from metadata, all-out contribute
  *     nothing, and only undecidable BOUNDARY files scan (masked,
  *     original predicate re-applied, partials combined via
  *     Add/Least/Greatest);
  *   - DELETION VECTORS: counts stay exact everywhere (live rows =
  *     physical − masked; count(col) additionally needs a zero null
  *     count under a DV). min/max use the same hybrid — only DV'd
  *     files whose recorded span could EXTEND past the clean-file
  *     baseline (or with missing spans) rescan, so an interior mask
  *     stays pure metadata and a masked extremum rescans one file;
  *   - column-mapped versions decline named-column folds (logical
  *     names would misalign against physical stats keys), collated
  *     strings and timestamps decline predicate classification
  *     (byte-order / physical-unit hazards), and a post-pushdown
  *     scan folds only when its pushed-filter state is provably
  *     consistent with the matched shape.
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
          case Some((t, relOut)) =>
            foldAll(aggExprs, t, relOut) match {
              case Some(rows) => LocalRelation(agg.output, rows)
              case None =>
                // pure-metadata fold declined (a DV could hide a
                // min/max extremum, a null count is missing, a file
                // predates row counts): try the HYBRID under a
                // vacuous WHERE — fold what metadata proves, scan
                // only the files it cannot decide
                foldCountWhere(agg, aggExprs,
                  Literal(true, BooleanType), t, relOut)
                  .getOrElse(agg)
            }
          case None => stripToFilteredVt(child) match {
            case Some((cond, t, relOut)) =>
              foldCountWhere(agg, aggExprs, cond, t, relOut)
                .getOrElse(agg)
            case None => agg
          }
        }
      // GROUPED metadata counts: GROUP BY one plain column over a
      // table whose files are (mostly) single-valued in it — the
      // daily-partitioned `GROUP BY day` shape. Point-span files
      // contribute their group's partial counts from the manifest;
      // undecided files scan and union in.
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs,
          child, _) if aggExprs.nonEmpty =>
        stripToVt(child) match {
          case Some((t, relOut)) =>
            foldGrouped(agg, g, aggExprs,
              Literal(true, BooleanType), t, relOut).getOrElse(agg)
          case None => stripToFilteredVt(child) match {
            case Some((cond, t, relOut)) =>
              foldGrouped(agg, g, aggExprs, cond, t, relOut)
                .getOrElse(agg)
            case None => agg
          }
        }
    }

  /** The relation beneath row-count-preserving wrappers, when it is a
    * versioned catalog table — plus the RELATION's own output
    * attributes, so min/max folds can anchor their column by exprId
    * (a surviving Project may alias an arbitrary expression under a
    * stats column's NAME; folding by name alone would answer the
    * wrong column's span). Handles both the pre-pushdown
    * [[DataSourceV2Relation]] (construction-time rule injection) and
    * the post-pushdown [[DataSourceV2ScanRelation]] (runtime
    * `extraOptimizations` fire after V2 pushdown) — the latter ONLY
    * when its parquet scan provably carries no pushed/partition/data
    * filters (a pushed predicate would make the manifest count an
    * over-count). */
  private def stripToVt(p: LogicalPlan)
      : Option[(VtTable, Seq[Attribute])] =
    stripToVtImpl(p, allowPushedData = false)

  /** `allowPushedData`: the filtered-count shape keeps the FULL
    * predicate as the Filter node above (file sources report every
    * data filter as post-scan — parquet row-group filtering is
    * best-effort, so Spark never removes a conjunct it pushed), and
    * the fold recomputes from the manifest + that Filter — whatever
    * the scan would have skipped is irrelevant. The WHOLE-TABLE fold
    * (no Filter above) must instead insist on a provably unfiltered
    * scan: a pushed predicate there means the relation does not
    * represent all rows. */
  private def stripToVtImpl(p: LogicalPlan, allowPushedData: Boolean)
      : Option[(VtTable, Seq[Attribute])] = p match {
    case Project(_, c) => stripToVtImpl(c, allowPushedData)
    case SubqueryAlias(_, c) => stripToVtImpl(c, allowPushedData)
    case r: DataSourceV2Relation => r.table match {
      case t: VtTable => Some((t, r.output))
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
      val acceptable = real match {
        case p: org.apache.spark.sql.execution.datasources.v2
            .parquet.ParquetScan =>
          p.partitionFilters.isEmpty && (allowPushedData ||
            (p.pushedFilters.isEmpty && p.dataFilters.isEmpty))
        case _ => false
      }
      if (!acceptable) None
      else s.relation.table match {
        case t: VtTable => Some((t, s.output))
        case _ => None
      }
    case _ => None
  }

  /** Fold every aggregate expression from the manifest, or None if
    * ANY of them is not provably answerable from metadata. The match
    * runs FIRST (pure, no I/O); the manifest is read once only when
    * every expression has a foldable shape. */
  private def foldAll(aggExprs: Seq[NamedExpression], t: VtTable,
      relOut: Seq[Attribute]): Option[Seq[InternalRow]] = {
    val relIds = relOut.map(_.exprId).toSet
    sealed trait Fold
    case object CountAll extends Fold
    final case class CountCol(a: AttributeReference) extends Fold
    final case class Span(a: AttributeReference, lo: Boolean) extends Fold
    val shapes: Seq[Option[Fold]] = aggExprs.map {
      // count(*) / count(<non-null literal>) — count(NULL) is 0 by
      // SQL null semantics, never the row count; leave it to the scan
      case Alias(AggregateExpression(
          Count(Seq(Literal(v, _))), Complete, false, None, _), _)
          if v != null =>
        Some(CountAll)
      // count(col) = Σ per file (rows − nulls), from the manifest's
      // per-column null counts — the most common profiling aggregate
      // after count(*), answered with zero data files opened
      case Alias(AggregateExpression(
          Count(Seq(a: AttributeReference)), Complete, false, None, _), _)
          if relIds.contains(a.exprId) =>
        Some(CountCol(a))
      case Alias(AggregateExpression(
          Min(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) && relIds.contains(a.exprId) =>
        Some(Span(a, lo = true))
      case Alias(AggregateExpression(
          Max(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) && relIds.contains(a.exprId) =>
        Some(Span(a, lo = false))
      case _ => None
    }
    if (shapes.exists(_.isEmpty)) return None
    if (shapes.exists {
        case Some(_: Span) | Some(_: CountCol) => t.vtHasMapping
        case _ => false
      }) return None // mapped names would misalign against stats keys
    // ONE manifest read (segment-cached) answers every expression
    val entries =
      try {
        VersionedTable.requireVisibleVersion(SparkSession.active,
          t.vtPath, t.vtVersion)
        VersionedTable.readEntries(SparkSession.active, t.vtPath,
          t.vtVersion)
      } catch { case scala.util.control.NonFatal(_) => return None }
    lazy val count: Option[Long] = VersionedTable.countRowsOf(entries)
    val spanCache = scala.collection.mutable.Map
      .empty[String, Option[Option[(Any, Any)]]]
    def span(col: String): Option[Option[(Any, Any)]] =
      spanCache.getOrElseUpdate(col,
        VersionedTable.statsSpanOf(entries, col))
    val values = shapes.map {
      case Some(CountAll) => count.map(n => n: Any)
      case Some(CountCol(a)) =>
        val parts = entries.map(VersionedTable.nonNullRowsOf(_, a.name))
        if (parts.exists(_.isEmpty)) None
        else Some(parts.map(_.get).sum: Any)
      case Some(Span(a, isLo)) =>
        span(a.name).map(_.map(s =>
          toCatalyst(if (isLo) s._1 else s._2, a)).orNull)
      case None => None // unreachable: shape gate above
    }
    if (values.exists(_.isEmpty)) None
    else Some(Seq(InternalRow.fromSeq(values.map(_.get))))
  }

  /** [[stripToVt]] through exactly one [[Filter]] — the
    * `count(*) WHERE <pred>` shape. Projects may sit above the
    * Filter; after PushDownPredicates the Filter sits on the
    * relation, so nothing row-changing hides below it. */
  private def stripToFilteredVt(p: LogicalPlan)
      : Option[(Expression, VtTable, Seq[Attribute])] = p match {
    case Project(_, c) => stripToFilteredVt(c)
    case SubqueryAlias(_, c) => stripToFilteredVt(c)
    case Filter(cond, c) =>
      stripToVtImpl(c, allowPushedData = true)
        .map { case (t, out) => (cond, t, out) }
    case _ => None
  }

  /** `count(*)` / `min` / `max` `WHERE <conjuncts>` from metadata + a
    * BOUNDARY-ONLY scan: files every conjunct provably matches in
    * full answer from the manifest (exact — null counts prove no null
    * row hides in an all-in file; for min/max the all-in file's span
    * extrema ARE its matching rows' extrema, since every row
    * matches), provably-out files contribute nothing, and only the
    * undecidable boundary files are scanned (masked/aliased, with the
    * ORIGINAL predicate re-applied; their partial aggregates combine
    * with the metadata side via Add/Least/Greatest). A time-range
    * count over a clustered 100 TB table reads two boundary files
    * instead of the whole overlap. For span shapes an all-in file
    * that carries a deletion vector (a masked row could have held the
    * extremum) or no recorded span demotes to the boundary scan.
    * Declines (plan untouched) unless every aggregate is a plain
    * count/min/max, every conjunct translates exactly, and metadata
    * actually decided at least one file. */
  private def foldCountWhere(agg: Aggregate,
      aggExprs: Seq[NamedExpression], cond: Expression, t: VtTable,
      relOut: Seq[Attribute]): Option[LogicalPlan] = {
    val relIds = relOut.map(_.exprId).toSet
    sealed trait Shape
    case object CountAll extends Shape
    final case class CountColAgg(a: AttributeReference) extends Shape
    final case class SpanAgg(a: AttributeReference, lo: Boolean)
      extends Shape
    val shapes: Seq[Shape] = aggExprs.map {
      case Alias(AggregateExpression(
          Count(Seq(Literal(v, _))), Complete, false, None, _), _)
          if v != null => CountAll
      case Alias(AggregateExpression(
          Count(Seq(a: AttributeReference)), Complete, false, None, _), _)
          if relIds.contains(a.exprId) && !t.vtHasMapping =>
        CountColAgg(a)
      case Alias(AggregateExpression(
          Min(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) && relIds.contains(a.exprId) &&
            !t.vtHasMapping =>
        SpanAgg(a, lo = true)
      case Alias(AggregateExpression(
          Max(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) && relIds.contains(a.exprId) &&
            !t.vtHasMapping =>
        SpanAgg(a, lo = false)
      case _ => return None
    }
    val spanCols = shapes.collect { case SpanAgg(a, _) => a.name }.distinct
    val countColAttrs = shapes.collect { case CountColAgg(a) => a }
      .distinctBy(_.name)
    val countCols = countColAttrs.map(_.name)
    val preds = toExactPreds(cond, relIds).getOrElse(return None)
    val spark = SparkSession.active
    val entries =
      try {
        VersionedTable.requireVisibleVersion(spark, t.vtPath, t.vtVersion)
        VersionedTable.readEntries(spark, t.vtPath, t.vtVersion)
      } catch { case scala.util.control.NonFatal(_) => return None }
    val (_, allIn0, boundary0) =
      VersionedTable.countWhereParts(entries, preds)
    // DEMOTE an all-in file to the boundary scan when its metadata
    // cannot answer a requested shape:
    //  (a) a span col's stats were never collected (all-null is fine
    //      — contributes nothing to min/max), or a count col's
    //      non-null rows are unprovable (no recorded null count, or
    //      a DV over a file WITH nulls — a masked row might have
    //      been either);
    //  (b) a DV'd file whose recorded span could EXTEND some span
    //      col's extremum past the CLEAN-file baseline — only those
    //      can hide a min/max behind the mask, so a 100 TB table
    //      with scattered DVs rescans a handful of extremum-touching
    //      files, not every masked one.
    def dvOf(e: graft.operators.VersionedTable.FileEntry): Boolean =
      e.dv.exists(_._2 > 0)
    val missing = allIn0.filter(e =>
      spanCols.exists(c => !e.stats.contains(c)) ||
        countCols.exists(c =>
          VersionedTable.nonNullRowsOf(e, c).isEmpty))
    val missingSet = missing.iterator.map(_.name).toSet
    val dvDemote =
      if (spanCols.isEmpty) Seq.empty
      else {
        val clean = allIn0.filter(e =>
          !dvOf(e) && !missingSet.contains(e.name))
        // clean-file baseline extrema; an incomparable reduce leaves
        // no baseline (conservative — and the metaSpan reduce below
        // will decline the whole fold on the same pair anyway)
        val base: Map[String, Option[(Any, Any)]] = spanCols.map { c =>
          var acc: Option[(Any, Any)] = None
          var bad = false
          clean.flatMap(_.stats.get(c)).flatten.foreach { s =>
            acc = acc match {
              case None => Some(s)
              case prev @ Some((lo, hi)) =>
                (VersionedTable.cmpMeta(s._1, lo),
                  VersionedTable.cmpMeta(s._2, hi)) match {
                  case (Some(cl), Some(ch)) =>
                    Some((if (cl < 0) s._1 else lo,
                      if (ch > 0) s._2 else hi))
                  case _ => bad = true; prev
                }
            }
          }
          c -> (if (bad) None else acc)
        }.toMap
        allIn0.filter(e => dvOf(e) && !missingSet.contains(e.name) &&
          spanCols.exists { c =>
            e.stats.get(c).flatten match {
              case None => false // all-null stays all-null under a mask
              case Some((mn, mx)) => base(c) match {
                case None => true // nothing clean bounds it: rescan
                case Some((blo, bhi)) =>
                  // live min ≥ recorded min, so only a recorded span
                  // STRICTLY outside the baseline can move an answer;
                  // incomparable pairs demote (conservative)
                  VersionedTable.cmpMeta(mn, blo).forall(_ < 0) ||
                    VersionedTable.cmpMeta(mx, bhi).forall(_ > 0)
              }
            }
          })
      }
    val demote = missing ++ dvDemote
    val demoted = demote.iterator.map(_.name).toSet
    val allIn = allIn0.filterNot(e => demoted.contains(e.name))
    val metaSum = allIn.map(_.liveRows).sum
    val metaNonNull: Map[String, Long] = countCols.map { c =>
      c -> allIn.map(e => VersionedTable.nonNullRowsOf(e, c).get).sum
    }.toMap
    val boundary = boundary0 ++ demote.map(_.name)
    if (boundary.size >= entries.size && entries.nonEmpty)
      return None // metadata decided nothing: the plain scan is better
    // per-span-column extrema over the all-in files (byte-order/SQL
    // exact — incomparable pairs decline the whole fold)
    val metaSpan: Map[String, Option[(Any, Any)]] =
      spanCols.map { c =>
        var acc: Option[(Any, Any)] = None
        allIn.flatMap(_.stats.get(c)).flatten.foreach { s =>
          acc = acc match {
            case None => Some(s)
            case Some((lo, hi)) =>
              (VersionedTable.cmpMeta(s._1, lo),
                VersionedTable.cmpMeta(s._2, hi)) match {
                case (Some(cl), Some(ch)) =>
                  Some((if (cl < 0) s._1 else lo,
                    if (ch > 0) s._2 else hi))
                case _ => return None
              }
          }
        }
        c -> acc
      }.toMap
    def metaLit(a: AttributeReference, lo: Boolean): Literal =
      metaSpan(a.name) match {
        case Some((mn, mx)) =>
          Literal(toCatalyst(if (lo) mn else mx, a), a.dataType)
        case None => Literal(null, a.dataType)
      }
    if (boundary.isEmpty)
      return Some(LocalRelation(agg.output,
        Seq(InternalRow.fromSeq(shapes.map {
          case CountAll => metaSum: Any
          case CountColAgg(a) => metaNonNull(a.name): Any
          case SpanAgg(a, lo) => metaLit(a, lo).value
        }))))
    // boundary files: one masked/aliased subset scan, original
    // predicate re-applied, partial aggregates combined with the
    // metadata side
    val slice = Bridge.logicalPlan(
      VersionedTable.readEntrySubset(spark, t.vtPath, t.vtVersion,
        boundary.toSet))
    val byName = slice.output.map(a => a.name -> a).toMap
    if (!relOut.forall(a => byName.contains(a.name))) return None
    val remap = Project(relOut.map(a =>
      Alias(byName(a.name), a.name)(exprId = a.exprId)), slice)
    val cnt = Alias(AggregateExpression(
      Count(Seq(Literal(1))), Complete, isDistinct = false),
      "graft_boundary_count")()
    val cntColAggs: Map[String, Alias] = countColAttrs.map { a =>
      a.name -> Alias(AggregateExpression(
        Count(Seq(a)), Complete, isDistinct = false),
        s"graft_boundary_cnt_${a.name}")()
    }.toMap
    val spanAggs: Map[(String, Boolean), Alias] =
      shapes.collect { case SpanAgg(a, lo) => (a, lo) }.distinct.map {
        case (a, lo) =>
          (a.name, lo) -> Alias(AggregateExpression(
            if (lo) Min(a) else Max(a), Complete, isDistinct = false),
            s"graft_boundary_${if (lo) "min" else "max"}_${a.name}")()
      }.toMap
    val inner = Aggregate(Nil,
      cnt +: (cntColAggs.values.toSeq ++ spanAggs.values.toSeq),
      Filter(cond, remap))
    val outs = shapes.zip(agg.output).map {
      case (CountAll, o) =>
        Alias(Add(cnt.toAttribute, Literal(metaSum)), o.name)(
          exprId = o.exprId)
      case (CountColAgg(a), o) =>
        Alias(Add(cntColAggs(a.name).toAttribute,
          Literal(metaNonNull(a.name))), o.name)(exprId = o.exprId)
      case (SpanAgg(a, lo), o) =>
        // Least/Greatest skip nulls, matching min/max combination
        val parts = Seq(spanAggs((a.name, lo)).toAttribute,
          metaLit(a, lo))
        Alias(if (lo) org.apache.spark.sql.catalyst.expressions
            .Least(parts)
          else org.apache.spark.sql.catalyst.expressions
            .Greatest(parts), o.name)(exprId = o.exprId)
    }
    Some(VtMaskedScanRewrite.fixedPointPushdown(Project(outs, inner)))
  }

  /** GROUPED metadata counts: `SELECT g, count(*)[, count(col)…]
    * [WHERE …] GROUP BY g` folds per group when files are
    * single-valued in `g` (point span, or provably all-null → the
    * NULL group). A g-clustered 100 TB table answers its per-day
    * row counts from one manifest read. Exact-or-scan per FILE:
    *   - point-span + zero g-nulls: every live row is group v —
    *     count(*) += liveRows (DV-safe), count(col) += the file's
    *     provable non-null count;
    *   - point-span + g-nulls, no DV: rows split v / NULL groups by
    *     the recorded null count; count(col≠g) is then unknowable
    *     per group and the file demotes;
    *   - all-null g: the whole file is the NULL group;
    *   - anything else (multi-valued span, DV over a nulls split,
    *     no stats) demotes to the boundary scan.
    * Boundary files scan with the ORIGINAL predicate and union in as
    * partial counts; the outer re-aggregate sums partials per group.
    * Declines unless the grouping column is a plain span-typed
    * relation attribute, every output is the group key or a plain
    * count, every conjunct translates, and metadata decided at least
    * one file. */
  private def foldGrouped(agg: Aggregate, g: AttributeReference,
      aggExprs: Seq[NamedExpression], cond: Expression, t: VtTable,
      relOut: Seq[Attribute]): Option[LogicalPlan] = {
    val relIds = relOut.map(_.exprId).toSet
    if (!relIds.contains(g.exprId) || !spanType(g) || t.vtHasMapping)
      return None
    sealed trait Shape
    case object GKey extends Shape
    case object CountAll extends Shape
    final case class CountColAgg(a: AttributeReference) extends Shape
    final case class SpanGAgg(a: AttributeReference, lo: Boolean)
      extends Shape
    val shapes: Seq[Shape] = aggExprs.map {
      case a: AttributeReference if a.exprId == g.exprId => GKey
      case Alias(a: AttributeReference, _)
          if a.exprId == g.exprId => GKey
      case Alias(AggregateExpression(
          Count(Seq(Literal(v, _))), Complete, false, None, _), _)
          if v != null => CountAll
      case Alias(AggregateExpression(
          Count(Seq(a: AttributeReference)), Complete, false, None, _), _)
          if relIds.contains(a.exprId) => CountColAgg(a)
      case Alias(AggregateExpression(
          Min(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) && relIds.contains(a.exprId) =>
        SpanGAgg(a, lo = true)
      case Alias(AggregateExpression(
          Max(a: AttributeReference), Complete, false, None, _), _)
          if spanType(a) && relIds.contains(a.exprId) =>
        SpanGAgg(a, lo = false)
      case _ => return None
    }
    val countCols = shapes.collect { case CountColAgg(a) => a }
      .distinctBy(_.name)
    val spanSlots = shapes.collect { case SpanGAgg(a, lo) => (a, lo) }
      .distinctBy(p => (p._1.name, p._2))
    val spanColAttrs = spanSlots.map(_._1).distinctBy(_.name)
    val preds = toExactPreds(cond, relIds).getOrElse(return None)
    val spark = SparkSession.active
    val entries =
      try {
        VersionedTable.requireVisibleVersion(spark, t.vtPath, t.vtVersion)
        VersionedTable.readEntries(spark, t.vtPath, t.vtVersion)
      } catch { case scala.util.control.NonFatal(_) => return None }
    val (_, allIn0, boundary0) =
      VersionedTable.countWhereParts(entries, preds)
    // per-file contributions: key None = the NULL group. A file whose
    // split is not provable contributes NOTHING and demotes whole.
    def contrib(e: graft.operators.VersionedTable.FileEntry)
        : Option[Seq[(Option[Any], String, Long)]] = {
      def dv = e.dv.exists(_._2 > 0)
      def colCounts(key: Option[Any])
          : Option[Seq[(Option[Any], String, Long)]] = {
        val parts = countCols.map { a =>
          if (a.name == g.name)
            // count(g) rows are exactly the non-NULL-group rows
            Some((key, a.name, if (key.isEmpty) 0L
              else VersionedTable.nonNullRowsOf(e, a.name)
                .getOrElse(return None)))
          else VersionedTable.nonNullRowsOf(e, a.name)
            .map(k => (key, a.name, k))
        }
        if (parts.exists(_.isEmpty)) None else Some(parts.map(_.get))
      }
      e.stats.get(g.name) match {
        case Some(Some((mn, mx)))
            if VersionedTable.cmpMeta(mn, mx).contains(0) =>
          e.nulls.get(g.name) match {
            case Some(0L) =>
              colCounts(Some(mn)).map(cs =>
                (Some(mn): Option[Any], "*", e.liveRows) +: cs)
            case Some(n) if !dv && countCols.forall(_.name == g.name) =>
              // the v / NULL split is exact from the null count, but
              // only count(*) and count(g) distribute over it —
              // count(other) could sit on either side of the split
              colCounts(Some(mn)).map(cs => Seq(
                (Some(mn): Option[Any], "*", e.nRows - n),
                (None: Option[Any], "*", n)) ++ cs)
            case _ => None
          }
        case Some(None) =>
          // g provably all-null: the whole file is the NULL group
          // (masking a null row leaves the rest null — DV-safe)
          colCounts(None).map(cs =>
            (None: Option[Any], "*", e.liveRows) +: cs)
        case _ => None
      }
    }
    // per-group MIN/MAX contributions: a point-g (or all-null-g)
    // file's c-span extrema ARE its group's extrema — but a DV could
    // mask them and a g-nulls split scatters them, so those demote;
    // an all-null c contributes nothing (SQL min/max skip nulls)
    def spanContrib(e: graft.operators.VersionedTable.FileEntry)
        : Option[Seq[(Option[Any], String, (Any, Any))]] = {
      if (spanSlots.isEmpty) return Some(Seq.empty)
      if (e.dv.exists(_._2 > 0)) return None
      val key: Option[Option[Any]] = e.stats.get(g.name) match {
        case Some(Some((mn, mx)))
            if VersionedTable.cmpMeta(mn, mx).contains(0) =>
          if (e.nulls.get(g.name).contains(0L)) Some(Some(mn)) else None
        case Some(None) => Some(None)
        case _ => None
      }
      key.flatMap { k =>
        val out = Seq.newBuilder[(Option[Any], String, (Any, Any))]
        spanColAttrs.foreach { c =>
          e.stats.get(c.name) match {
            case Some(Some(sp)) => out += ((k, c.name, sp))
            case Some(None) => () // all-null column: nothing to add
            case None => return None // stats never collected: demote
          }
        }
        Some(out.result())
      }
    }
    val metaCount =
      scala.collection.mutable.LinkedHashMap.empty[Option[Any], Long]
    val metaColCount = scala.collection.mutable
      .Map.empty[(Option[Any], String), Long]
    val metaSpanG = scala.collection.mutable
      .Map.empty[(Option[Any], String), (Any, Any)]
    val demoted = Seq.newBuilder[String]
    allIn0.foreach { e =>
      (contrib(e), spanContrib(e)) match {
        case (Some(cs), Some(ss)) =>
          cs.foreach {
            case (key, "*", n) =>
              metaCount(key) = metaCount.getOrElse(key, 0L) + n
            case (key, c, n) =>
              metaColCount((key, c)) =
                metaColCount.getOrElse((key, c), 0L) + n
          }
          ss.foreach { case (key, c, (mn, mx)) =>
            metaSpanG.get((key, c)) match {
              case None => metaSpanG((key, c)) = (mn, mx)
              case Some((lo, hi)) =>
                (VersionedTable.cmpMeta(mn, lo),
                  VersionedTable.cmpMeta(mx, hi)) match {
                  case (Some(cl), Some(ch)) =>
                    metaSpanG((key, c)) =
                      (if (cl < 0) mn else lo, if (ch > 0) mx else hi)
                  case _ => return None // not provably SQL order
                }
            }
          }
        case _ => demoted += e.name
      }
    }
    val demotedSet = demoted.result().toSet
    val boundary = boundary0 ++ demotedSet
    if (boundary.size >= entries.size && entries.nonEmpty)
      return None // metadata decided nothing: the plain scan is better
    def keyValue(k: Option[Any]): Any =
      k.map(toCatalyst(_, g)).orNull
    // a fully-masked point file contributes 0 to its group: a real
    // scan would emit NO group for it, so zero-count keys must not
    // materialize rows (span shapes cannot leak here — DV'd files
    // demote whole when any span shape is present)
    val liveKeys = metaCount.keys.toSeq.filter(k => metaCount(k) > 0L)
    val metaRows: Seq[Seq[Any]] = liveKeys.map { k =>
      (keyValue(k) +: (metaCount(k) +: countCols.map(c =>
        metaColCount.getOrElse((k, c.name), 0L): Any)))
        .map(x => x: Any) ++ spanSlots.map { case (a, lo) =>
          metaSpanG.get((k, a.name))
            .map(sp => toCatalyst(if (lo) sp._1 else sp._2, a))
            .orNull: Any
        }
    }
    if (boundary.isEmpty) {
      val rows = liveKeys.map { k =>
        InternalRow.fromSeq(shapes.map {
          case GKey => keyValue(k)
          case CountAll => metaCount(k): Any
          case CountColAgg(a) =>
            metaColCount.getOrElse((k, a.name), 0L): Any
          case SpanGAgg(a, lo) =>
            metaSpanG.get((k, a.name))
              .map(sp => toCatalyst(if (lo) sp._1 else sp._2, a))
              .orNull
        })
      }
      return Some(LocalRelation(agg.output, rows))
    }
    // union the metadata partials with the boundary scan's partials,
    // then re-aggregate: sum per group
    val nPartials = 1 + countCols.size
    val localAttrs = (AttributeReference("g", g.dataType,
      nullable = true)() +:
      (0 until nPartials).map(i => AttributeReference(s"p$i",
        org.apache.spark.sql.types.LongType, nullable = false)())) ++
      spanSlots.zipWithIndex.map { case ((a, _), i) =>
        AttributeReference(s"s$i", a.dataType, nullable = true)()
      }
    val localRows = metaRows.map(r => InternalRow.fromSeq(r))
    val local = LocalRelation(localAttrs, localRows)
    val slice = Bridge.logicalPlan(
      VersionedTable.readEntrySubset(spark, t.vtPath, t.vtVersion,
        boundary.toSet))
    val byName = slice.output.map(a => a.name -> a).toMap
    if (!relOut.forall(a => byName.contains(a.name))) return None
    val remap = Project(relOut.map(a =>
      Alias(byName(a.name), a.name)(exprId = a.exprId)), slice)
    val bPartials = (Alias(AggregateExpression(
      Count(Seq(Literal(1))), Complete, isDistinct = false), "p0")() +:
      countCols.zipWithIndex.map { case (a, i) =>
        Alias(AggregateExpression(Count(Seq(a)), Complete,
          isDistinct = false), s"p${i + 1}")()
      }) ++ spanSlots.zipWithIndex.map { case ((a, lo), i) =>
        Alias(AggregateExpression(if (lo) Min(a) else Max(a),
          Complete, isDistinct = false), s"s$i")()
      }
    val bAgg = Aggregate(Seq(g),
      Alias(g, "g")() +: bPartials, Filter(cond, remap))
    val union = org.apache.spark.sql.catalyst.plans.logical
      .Union(Seq(local, bAgg))
    val uG = union.output.head
    val uP = union.output.tail
    def summed(i: Int): Expression =
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
        AggregateExpression(org.apache.spark.sql.catalyst.expressions
          .aggregate.Sum(uP(i)), Complete, isDistinct = false),
        Literal(0L)))
    val outs = shapes.zip(agg.output).map {
      case (GKey, o) => Alias(uG, o.name)(exprId = o.exprId)
      case (CountAll, o) => Alias(summed(0), o.name)(exprId = o.exprId)
      case (CountColAgg(a), o) =>
        Alias(summed(1 + countCols.indexWhere(_.name == a.name)),
          o.name)(exprId = o.exprId)
      case (SpanGAgg(a, lo), o) =>
        val slot = nPartials + spanSlots.indexWhere(p =>
          p._1.name == a.name && p._2 == lo)
        Alias(AggregateExpression(
          if (lo) Min(uP(slot)) else Max(uP(slot)),
          Complete, isDistinct = false), o.name)(exprId = o.exprId)
    }
    Some(VtMaskedScanRewrite.fixedPointPushdown(
      Aggregate(Seq(uG), outs, union)))
  }

  /** Translate a WHERE into exact file-level predicates — EVERY
    * conjunct must translate, or the fold declines (a dropped
    * conjunct would over-count; this is the opposite posture from
    * [[graft.sources.VtPushdown]]'s conservative pruning). */
  private def toExactPreds(cond: Expression,
      relIds: Set[ExprId]): Option[Seq[ExactPred]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def isTs(a: AttributeReference): Boolean = a.dataType match {
      case _: org.apache.spark.sql.types.TimestampType => true
      case _: org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    // timestamp literals wrap in the manifest's unit-normalized
    // micros domain ([[VersionedTable.TsMicros]]); spans harvested
    // before unit tagging stay raw Longs, compare as incomparable,
    // and conservatively decline — never a unit-mixed misclassify
    def v(a: AttributeReference, l: Literal): Any = l.value match {
      case u: UTF8String => u.toString
      case other: java.lang.Long if isTs(a) =>
        VersionedTable.TsMicros(other)
      case other => other
    }
    def ok(a: AttributeReference): Boolean =
      relIds.contains(a.exprId) && (a.dataType match {
        // non-default collations (Spark 4 StringType(collationId))
        // compare under ICU rules — e.g. UTF8_LCASE `= 'abc'` must
        // match 'ABC' — while span classification compares unsigned
        // bytes; only UTF8_BINARY's order IS byte order, so collated
        // columns decline to the plain scan
        case s: org.apache.spark.sql.types.StringType =>
          s == org.apache.spark.sql.types.StringType
        case _ => true
      })
    val out = conjuncts(cond).map {
      // OR keeps its tree shape (no DNF expansion): each disjunct
      // translates as its own conjunction, and classification runs
      // per-alternative — `year = 1995 OR year = 1997`, the everyday
      // shape a conjunct-only walk sent to a full scan. EVERY
      // disjunct must translate or the whole WHERE declines (a
      // dropped disjunct would under-count; a widened one over-count)
      case o: Or =>
        def disjuncts(x: Expression): Seq[Expression] = x match {
          case Or(l, r) => disjuncts(l) ++ disjuncts(r)
          case y => Seq(y)
        }
        val alts = disjuncts(o).map(d => toExactPreds(d, relIds))
        if (alts.exists(_.isEmpty)) None
        else Some(Seq(ExactOr(alts.map(_.get))))
      case Literal(true, BooleanType) => Some(Nil)
      case Literal(false, BooleanType) | Literal(null, _) =>
        Some(Seq(ExactIn("", Seq.empty))) // provably empty everywhere
      case EqualTo(a: AttributeReference, l: Literal) if ok(a) =>
        if (l.value == null) Some(Seq(ExactIn(a.name, Seq.empty)))
        else Some(Seq(ExactRange(a.name,
          Some((v(a, l), true)), Some((v(a, l), true)))))
      case EqualTo(l: Literal, a: AttributeReference) if ok(a) =>
        if (l.value == null) Some(Seq(ExactIn(a.name, Seq.empty)))
        else Some(Seq(ExactRange(a.name,
          Some((v(a, l), true)), Some((v(a, l), true)))))
      case GreaterThan(a: AttributeReference, l: Literal)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, Some((v(a, l), false)), None)))
      case GreaterThan(l: Literal, a: AttributeReference)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, None, Some((v(a, l), false)))))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, Some((v(a, l), true)), None)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, None, Some((v(a, l), true)))))
      case LessThan(a: AttributeReference, l: Literal)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, None, Some((v(a, l), false)))))
      case LessThan(l: Literal, a: AttributeReference)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, Some((v(a, l), false)), None)))
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, None, Some((v(a, l), true)))))
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if ok(a) && l.value != null =>
        Some(Seq(ExactRange(a.name, Some((v(a, l), true)), None)))
      case In(a: AttributeReference, vs) if ok(a) &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Some(Seq(ExactIn(a.name, vs.collect {
          case l: Literal if l.value != null => v(a, l) })))
      case InSet(a: AttributeReference, vs) if ok(a) =>
        Some(Seq(ExactIn(a.name, vs.toSeq.filter(_ != null).map {
          case u: UTF8String => u.toString
          case other: java.lang.Long if isTs(a) =>
            VersionedTable.TsMicros(other)
          case other => other
        })))
      case IsNotNull(a: AttributeReference) if ok(a) =>
        Some(Seq(ExactNotNull(a.name)))
      case IsNull(a: AttributeReference) if ok(a) =>
        Some(Seq(ExactIsNull(a.name)))
      // LIKE 'prefix%' (optimizer-lowered to StartsWith): exactly the
      // byte-order range [prefix, prefix-with-last-char+1) — decline
      // when no safe upper bound exists (an open range would claim
      // all-in for rows merely >= the prefix)
      case StartsWith(a: AttributeReference, l: Literal)
          if ok(a) && l.value != null =>
        val prefix = l.value.toString
        VersionedTable.prefixUpperBound(prefix).map(up =>
          Seq(ExactRange(a.name,
            Some((prefix, true)), Some((up, false)))))
      // negations: != / NOT IN. A NULL member makes the predicate
      // match nothing (NULL NOT IN is never true) — the provably-
      // empty ExactIn, same as `= NULL`.
      case Not(EqualTo(a: AttributeReference, l: Literal)) if ok(a) =>
        if (l.value == null) Some(Seq(ExactIn(a.name, Seq.empty)))
        else Some(Seq(ExactNotIn(a.name, Seq(v(a, l)))))
      case Not(EqualTo(l: Literal, a: AttributeReference)) if ok(a) =>
        if (l.value == null) Some(Seq(ExactIn(a.name, Seq.empty)))
        else Some(Seq(ExactNotIn(a.name, Seq(v(a, l)))))
      case Not(In(a: AttributeReference, vs)) if ok(a) &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val vals = vs.map(_.asInstanceOf[Literal])
        if (vals.exists(_.value == null))
          Some(Seq(ExactIn(a.name, Seq.empty)))
        else Some(Seq(ExactNotIn(a.name, vals.map(v(a, _)))))
      case Not(InSet(a: AttributeReference, vs)) if ok(a) && vs.nonEmpty =>
        if (vs.exists(_ == null)) Some(Seq(ExactIn(a.name, Seq.empty)))
        else Some(Seq(ExactNotIn(a.name, vs.toSeq.map {
          case u: UTF8String => u.toString
          case other: java.lang.Long if isTs(a) =>
            VersionedTable.TsMicros(other)
          case other => other
        })))
      case _ => None
    }
    if (out.exists(_.isEmpty)) None
    else Some(out.flatMap(_.get))
  }

  /** Span values are normalized to Long/Double/String in the
    * manifest; only columns whose Catalyst type maps back identically
    * are foldable. Doubles are safe: a RECORDED span proves the file
    * holds no NaN (parquet-mr omits bounds for NaN-bearing chunks —
    * the engine writes every file through it), and NaN-bearing files
    * simply carry no span and block the fold. */
  private def spanType(a: Attribute): Boolean = a.dataType match {
    case LongType | DoubleType | StringType => true
    // dates normalize through their physical epoch days (Long in the
    // manifest, Int in Catalyst); timestamps through unit-normalized
    // TsMicros spans (raw legacy spans decline via incomparability)
    case DateType => true
    case _: org.apache.spark.sql.types.TimestampType => true
    case _: org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  private def toCatalyst(v: Any, a: Attribute): Any = (v, a.dataType) match {
    case (l: Long, LongType) => l
    case (d: Double, DoubleType) => d
    case (l: Long, DateType) => l.toInt // epoch days
    case (VersionedTable.TsMicros(l),
      _: org.apache.spark.sql.types.TimestampType) => l
    case (VersionedTable.TsMicros(l),
      _: org.apache.spark.sql.types.TimestampNTZType) => l
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
