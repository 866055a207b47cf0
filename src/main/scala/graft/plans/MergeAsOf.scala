package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native sort-merge AS-OF join — custom-operator ladder step (c): a
  * whole-operator semantic Spark lacks, expressed as its own
  * `LogicalPlan` + `Strategy` + `SparkPlan` and registered through the
  * session's strategy list. The declarative twin
  * (`operators/AsOfJoin`: union + window carry) stays the reference
  * semantics; this operator computes the same rows in ONE streaming
  * merge pass per partition:
  *
  *   - required distribution: both sides hash-clustered on the key —
  *     `EnsureRequirements` inserts the exchanges and co-partitions
  *     the children exactly as it does for SortMergeJoin;
  *   - required ordering: (key, ts) ascending both sides — parallel
  *     in-partition sorts, no unioned frame, no window state, no
  *     null-padded union columns;
  *   - execute: zip the co-partitioned children and merge — O(|L|+|R|)
  *     per partition with one retained candidate row (backward), one
  *     lookahead (forward), or both (nearest). Peak memory per task is
  *     TWO rows beyond the sort buffers, vs the window operator's
  *     whole-frame spill surface.
  *
  * Semantics pinned to the declarative operator and the DuckDB ASOF
  * oracle: null timestamps and null keys never match (null-ts/key left
  * rows carry a null payload); nearest breaks exact-microsecond ties
  * backward via integer micros arithmetic. Skew note: like any keyed
  * merge, a pathologically hot key serializes into one task —
  * `AsOfJoin.timeSliceMicros` remains the skew lever; this operator is
  * the throughput lever.
  */
object MergeAsOf {

  /** As-of join `left` with `right` (both carrying `keyCol` + `tsCol`;
    * payload columns from `right` come back as `asof_<name>`).
    *
    * SKEW LEVER (`timeSliceMicros`): the native merge keys its
    * ClusteredDistribution on `keyCol`, so — exactly like SortMergeJoin
    * or a window — one pathologically hot key serializes into one
    * task. `timeSliceMicros = Some(span)` keeps the NATIVE merge but
    * re-keys it on the composite `(key, slice)` (see [[slicedNative]]):
    * a hot key fans out across its slices, each task still holding two
    * rows of state, and the cross-slice candidates are repaired with
    * the same O(keys × slices) boundary frame the declarative sliced
    * plan uses. Identical output schema `left.* ++ asof_<payload>`,
    * identical semantics — MergeAsOfSpec pins native-sliced ≡
    * declarative-sliced ≡ unsliced row-identical, boundary timestamps
    * included. Pay it when key skew is known; probe numbers in
    * SCALE.md. */
  def join(
      left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], direction: String = "backward",
      timeSliceMicros: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    timeSliceMicros.foreach { span =>
      require(span > 0, s"timeSliceMicros must be positive, got $span")
      return slicedNative(
        left, right, keyCol, tsCol, payloadCols, direction, span)
    }
    val spark = left.sparkSession
    ensureRegistered(spark)
    // Manual pruning: the optimizer does not see through a foreign
    // node, so hand it exactly the columns the merge needs.
    val r = right.select((Seq(keyCol, tsCol) ++ payloadCols).distinct
      .map(org.apache.spark.sql.functions.col): _*)
    val rPlan = Bridge.logicalPlan(r)
    // Output attrs minted ONCE here: optimizer copies of the node must
    // keep the same exprIds or references from enclosing Projects break.
    val payloadAttrs = payloadCols.map { c =>
      val src = rPlan.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"MergeAsOf: right side lacks column $c"))
      AttributeReference(s"asof_$c", src.dataType, nullable = true)()
    }
    Bridge.ofRows(spark, MergeAsOfPlan(
      Bridge.logicalPlan(left), rPlan,
      keyCol, tsCol, payloadCols, direction, payloadAttrs))
  }

  /** The native merge under time-slice salting. Both sides gain an
    * exact integer slice (`floor(micros / span)`) and the merge runs
    * keyed on `struct(key, slice)` — interpreted struct ordering sorts
    * (key, slice) lexicographically and `EnsureRequirements` hashes the
    * composite, so a hot key's rows spread across its slices instead of
    * serializing into one task. What a within-slice merge misses —
    * candidates in OTHER slices — is repaired from a boundary frame of
    * per-(key, slice) latest/earliest right payloads, prefix/suffix-
    * carried on the O(keys × slices) spine (the declarative sliced
    * plan's machinery, reused shape-for-shape so the two levers stay
    * semantically twins).
    *
    * Correctness of the nearest pick with only the IN-SLICE winner in
    * hand: a same-side in-slice candidate always beats that side's
    * cross-slice boundary (strictly closer in time), and when the
    * in-slice merge had BOTH sides and chose one, the chosen row also
    * beats the opposite boundary (it beat the opposite in-slice row,
    * which is itself closer than that boundary). So comparing {chosen
    * in-slice candidate, __prevp, __nextp} with the standing µs-exact
    * tie rule (backward on equal deltas) reproduces the global nearest
    * exactly. */
  private def slicedNative(
      lf: DataFrame, rt: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], direction: String, span: Long): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, lit, pmod, struct,
      unix_micros, max_by, min_by, when, last, first}
    import org.apache.spark.sql.expressions.Window
    def usExpr(df: DataFrame): Column = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(tsCol)
      case _ => unix_micros(col(tsCol))
    }
    // exact floor division on integer micros (the declarative lever's
    // rule: a double divide can misround a slice-boundary row)
    def withSlice(df: DataFrame): DataFrame = {
      val us = usExpr(df)
      df.withColumn("__slice",
        ((us - pmod(us, lit(span))) / lit(span)).cast("long"))
    }
    val lS = withSlice(lf)
      .withColumn("__mk", struct(col(keyCol), col("__slice")))
    val rS = withSlice(rt)
      .withColumn("__rts0", usExpr(rt))
      .withColumn("__mk", struct(col(keyCol), col("__slice")))
    // boundary frame: per (key, slice) the latest/earliest right
    // payload, carried across slices — O(keys × slices) rows
    val plStruct = struct(col("__rts0").as("__rts"),
      struct(payloadCols.map(col): _*).as("__p"))
    val bnd = rS.groupBy(col(keyCol), col("__slice"))
      .agg(max_by(plStruct, col("__rts0")).as("__bndb"),
        min_by(plStruct, col("__rts0")).as("__bndf"))
    val spine = lS.select(col(keyCol), col("__slice"))
      .unionByName(rS.select(col(keyCol), col("__slice"))).distinct()
      .join(bnd, Seq(keyCol, "__slice"), "left")
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("__slice").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("__slice").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val carried = spine
      .withColumn("__prevp", last(col("__bndb"), ignoreNulls = true).over(wPrev))
      .withColumn("__nextp", first(col("__bndf"), ignoreNulls = true).over(wNext))
      .select(col(keyCol), col("__slice"), col("__prevp"), col("__nextp"))
    // the native merge on the composite key; the right ts rides along
    // as a payload so candidate EXISTENCE and deltas are observable
    val merged = join(lS, rS, "__mk", tsCol,
        payloadCols :+ "__rts0", direction, None)
      .join(carried, Seq(keyCol, "__slice"), "left")
    val usL = usExpr(merged)
    val inTs = col("asof___rts0")
    val inP = struct(inTs.as("__rts"),
      struct(payloadCols.map(c => col(s"asof_$c").as(c)): _*).as("__p"))
    val asof = direction match {
      case "backward" =>
        when(inTs.isNotNull, inP).otherwise(col("__prevp"))
      case "forward" =>
        when(inTs.isNotNull, inP).otherwise(col("__nextp"))
      case _ =>
        // the in-slice winner routes to its own side; the opposite
        // side's best visible candidate is the boundary (see scaladoc)
        val bestB = when(inTs.isNotNull && inTs <= usL, inP)
          .otherwise(col("__prevp"))
        val bestF = when(inTs.isNotNull && inTs > usL, inP)
          .otherwise(col("__nextp"))
        when(bestF.isNull, bestB)
          .when(bestB.isNull, bestF)
          .when(usL - bestB.getField("__rts") <=
            bestF.getField("__rts") - usL, bestB)
          .otherwise(bestF)
    }
    // null-key/null-ts left rows match nothing (classic-path contract);
    // their carried boundary is already null (null never joins), but
    // guard explicitly so the contract never rests on join semantics
    val guarded = when(col(keyCol).isNotNull && col(tsCol).isNotNull, asof)
    val out = merged.withColumn("__asof", guarded)
    payloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__asof.__p.$c"))
    }.select(lf.columns.map(col).toSeq ++
      payloadCols.map(c => col(s"asof_$c")): _*)
  }

  /** Idempotent strategy registration (public `experimental` hook —
    * the runtime analog of `injectPlannerStrategy`). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.experimental.extraStrategies.synchronized {
      if (!spark.experimental.extraStrategies.exists(
          _.isInstanceOf[MergeAsOfStrategy.type]))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ MergeAsOfStrategy
    }
}

/** Logical node: holds column NAMES (resolved against the children at
  * planning) plus the pre-minted output payload attrs (constructor
  * parameter so optimizer copies keep their exprIds — a lazily-minted
  * set would re-mint on every `withNewChildren` copy and orphan any
  * enclosing Project's references). */
case class MergeAsOfPlan(
    left: LogicalPlan, right: LogicalPlan,
    keyCol: String, tsCol: String, payloadCols: Seq[String],
    direction: String, payloadAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadAttrs

  /** Every child column is load-bearing (left columns are output;
    * right was hand-pruned to key/ts/payload) — declaring them stops
    * ColumnPruning's default treatment of a no-expression foreign node
    * (references = ∅ ⇒ children pruned to NOTHING). */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): MergeAsOfPlan =
    copy(left = newLeft, right = newRight)
}

object MergeAsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: MergeAsOfPlan =>
      def attrOf(side: LogicalPlan, name: String): Attribute =
        side.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(
            s"MergeAsOf: missing column $name"))
      MergeAsOfExec(
        attrOf(p.left, p.keyCol), attrOf(p.left, p.tsCol),
        attrOf(p.right, p.keyCol), attrOf(p.right, p.tsCol),
        p.payloadCols.map(attrOf(p.right, _)), p.payloadAttrs,
        p.direction, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class MergeAsOfExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute],
    direction: String, left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  require(Seq(leftTs, rightTs).forall(a => a.dataType match {
    case TimestampType | TimestampNTZType | LongType => true
    case _ => false
  }), s"MergeAsOf needs a timestamp/long ts column, got ${leftTs.dataType}")

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val kIdxL = left.output.indexWhere(_.exprId == leftKey.exprId)
    val tIdxL = left.output.indexWhere(_.exprId == leftTs.exprId)
    val kIdxR = right.output.indexWhere(_.exprId == rightKey.exprId)
    val tIdxR = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(Seq(kIdxL, tIdxL, kIdxR, tIdxR).forall(_ >= 0))
    val payloadExprs = payload
    val rightOut = right.output
    val arity = payload.size
    val dir = direction
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val ord = TypeUtils.getInterpretedOrdering(keyType)
      val proj = UnsafeProjection.create(payloadExprs, rightOut)
      val rBuf = rIt.buffered
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(arity)
      // downstream consumers (collect, exchanges) require UnsafeRow
      val resultProj = UnsafeProjection.create(output, output)
      new Iterator[InternalRow] {
        // retained backward candidate: projected payload COPY + key/ts
        private var candKey: Any = null
        private var candTs: Long = 0L
        private var cand: InternalRow = null

        override def hasNext: Boolean = lIt.hasNext

        /** consume-this-right-row test for the current left (lk, lts);
          * null key/ts right rows sort first and are consumed+skipped. */
        private def shouldConsume(r: InternalRow, lk: Any, lts: Long): Boolean = {
          if (r.isNullAt(kIdxR)) return true
          val cmp = ord.compare(r.get(kIdxR, keyType), lk)
          if (cmp < 0) true
          else if (cmp > 0) false
          else if (r.isNullAt(tIdxR)) true
          else if (dir == "forward") r.getLong(tIdxR) < lts
          else r.getLong(tIdxR) <= lts
        }

        override def next(): InternalRow = {
          val l = lIt.next()
          if (l.isNullAt(kIdxL) || l.isNullAt(tIdxL))
            return resultProj(joined(l, nullPayload)) // null never matches
          val lk = l.get(kIdxL, keyType)
          val lts = l.getLong(tIdxL)
          while (rBuf.hasNext && shouldConsume(rBuf.head, lk, lts)) {
            val r = rBuf.next()
            if (!r.isNullAt(kIdxR) && !r.isNullAt(tIdxR)) {
              candKey = InternalRow.copyValue(r.get(kIdxR, keyType))
              candTs = r.getLong(tIdxR)
              cand = proj(r).copy()
            }
          }
          val bwdOk = cand != null && ord.compare(candKey, lk) == 0
          def fwdRow: InternalRow = // head is ≥ (lk, lts) by the advance
            if (rBuf.hasNext && !rBuf.head.isNullAt(kIdxR) &&
                ord.compare(rBuf.head.get(kIdxR, keyType), lk) == 0)
              rBuf.head
            else null
          val p: InternalRow = dir match {
            case "backward" => if (bwdOk) cand else nullPayload
            case "forward" =>
              val f = fwdRow; if (f != null) proj(f) else nullPayload
            case _ => // nearest: exact integer-µs deltas, ties backward
              val f = fwdRow
              if (f == null) { if (bwdOk) cand else nullPayload }
              else if (!bwdOk) proj(f)
              else if (lts - candTs <= f.getLong(tIdxR) - lts) cand
              else proj(f)
          }
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): MergeAsOfExec =
    copy(left = newLeft, right = newRight)
}
