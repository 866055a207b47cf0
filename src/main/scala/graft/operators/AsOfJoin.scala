package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — a time-series operator Spark lacks natively (SURVEY
  * §2.3 lists the join family as built-in; as-of is the one genuinely
  * missing member, called out in the build mandate). Three directions:
  * "backward" (most recent right row at-or-before — the classic),
  * "forward" (earliest right row at-or-after — time-to-next-event),
  * "nearest" (whichever of the two is closer in time; exact ties
  * prefer backward — a pinned rule both engines replay).
  *
  * Composition strategy (preference (a) of the custom-operator ladder:
  * compose built-ins before writing a SparkPlan): tag both sides, UNION
  * them, and carry the latest right-side (ts, payload) forward with
  * `last(_, ignoreNulls)` over a (key, time) window — forward is the
  * same carry on reversed time; nearest runs both carries over the one
  * unioned frame (two sorts of the same shuffled partition, still no
  * join blow-up). Crucially NO range-expanded join: a naive
  * `l.join(r, l.ts >= r.ts)` is O(|L|·|R|) per key before aggregation,
  * which is exactly the blow-up that kills at 100 TB. This plan is
  * O((|L|+|R|) log) via sort-merge, AQE-skew-splittable, and needs no
  * driver-side state.
  *
  * Tie semantics: a right row at exactly left.ts IS visible in every
  * direction (inclusive), ordered before the left row via the side
  * tag — matching DuckDB's ASOF JOIN (`l.ts >= r.ts` / `l.ts <= r.ts`),
  * which the correctness oracles use.
  *
  * SKEW (`timeSliceMicros`): a `Window.partitionBy(key)` partition is
  * NOT splittable — not by AQE (which splits shuffle-read partitions
  * for joins/aggs, never a window's sort group), not by anything: one
  * pathological hot key (a bot user with 10⁹ events) serializes into
  * ONE task. `timeSliceMicros = Some(span)` is the salt-and-merge
  * recipe for the carry: partition the timeline into fixed slices and
  * window over (key, slice) — the hot key becomes (hot, slice₁..ₙ)
  * groups that sort in parallel — then repair the cross-slice carry
  * with a per-(key, slice) BOUNDARY frame (≤ one row per non-empty
  * slice, i.e. |keys|·|slices| rows, data-size-independent): the
  * latest right payload per slice, prefix-carried over slices by a
  * window whose partitions are now O(|slices per key|), and joined
  * back on (key, slice). Result is bit-identical to the unsliced plan
  * (DifferentialSpec proves it on a hot key spanning empty slices) at
  * the cost of one extra small shuffle — pay it when key skew is
  * known, skip it when keys are well-distributed. Requires unique
  * right-side (key, ts) pairs for deterministic output — the same
  * precondition the unsliced form and DuckDB's ASOF already carry.
  */
object AsOfJoin {

  /** For every left row, append `payloadCols` from the matched right
    * row per `direction` (see object doc); nulls when no matching
    * right row exists. `timeSliceMicros`: see the skew note above. */
  def apply(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      payloadCols: Seq[String],
      direction: String = "backward",
      timeSliceMicros: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq
    // Carry (right ts, payload struct): nearest needs the matched ts to
    // compare distances; backward/forward just project the payload out.
    val carrySchema = right
      .select(col(tsCol).as("__rts"),
        struct(payloadCols.map(col): _*).as("__p"))
      .schema.catalogString
    val lTagged = left
      .withColumn("__payload", lit(null).cast(carrySchema))
      .withColumn("__side", lit(1))
    // NULL-ts semantics pinned to the DuckDB ASOF the oracles use: a
    // null timestamp never matches (the >=/<= comparison is NULL), so
    // null-ts right rows are dropped here and null-ts left rows get a
    // null payload in the final projection. (Without this, Spark's
    // asymmetric null ordering — nulls first under asc, last under
    // desc — would hand null-ts rows direction-dependent matches, and
    // the sliced mode would diverge from the classic mode on them.)
    // Null KEYS never match either (SQL equality, same as the DuckDB
    // ASOF oracle and the native MergeAsOfExec): dropping null-key
    // right rows leaves null-key left partitions with nothing to carry,
    // so they emit a null payload — without this, Spark's window
    // partitioning would group the nulls together and hand them
    // matches no SQL join would produce.
    val rTagged = right
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct(col(tsCol).as("__rts"),
          struct(payloadCols.map(col): _*).as("__p")).as("__payload"))
      .withColumn("__side", lit(0))
    // Align schemas: left keeps all columns; right contributes only
    // key/ts/carry (null-padded for the rest).
    val unioned = lTagged.unionByName(
      leftCols.filterNot(c => c == keyCol || c == tsCol)
        .foldLeft(rTagged)((df, c) =>
          df.withColumn(c, lit(null).cast(lTagged.schema(c).dataType))),
      allowMissingColumns = false)
    // Sliced mode: window partitions are (key, slice); slicePartCols
    // collapses to just (key) in the classic mode.
    val sliced = timeSliceMicros match {
      case None => unioned
      case Some(span) =>
        require(span > 0, s"timeSliceMicros must be positive, got $span")
        // Exact floor division on integer micros: subtracting pmod makes
        // the dividend an exact multiple, so the long division is exact
        // (a double divide of raw e15-scale micros can misround at a
        // slice boundary and put a boundary row in the wrong slice).
        val us = unix_micros(col(tsCol))
        unioned.withColumn("__slice",
          ((us - pmod(us, lit(span))) / lit(span)).cast("long"))
    }
    val partCols: Seq[Column] =
      if (timeSliceMicros.isEmpty) Seq(col(keyCol))
      else Seq(col(keyCol), col("__slice"))
    def carry(tsOrd: Column): Column =
      last(col("__payload"), ignoreNulls = true).over(
        Window.partitionBy(partCols: _*)
          .orderBy(tsOrd, col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // Cross-slice boundary repair (sliced mode only): per (key, slice),
    // the latest/earliest right payload; prefix-carried across slices on
    // a frame of ≤ |keys|·|slices| rows, then joined back. __prevp/
    // __nextp are what a within-slice carry misses from other slices.
    val withBoundary = timeSliceMicros match {
      case None => sliced
      case Some(_) =>
        val rightRows = sliced.where(col("__side") === 0)
          .select(col(keyCol), col("__slice"), col(tsCol), col("__payload"))
        val bnd = rightRows.groupBy(col(keyCol), col("__slice"))
          .agg(max_by(col("__payload"), col(tsCol)).as("__bndb"),
            min_by(col("__payload"), col(tsCol)).as("__bndf"))
        val spine = sliced.select(col(keyCol), col("__slice")).distinct()
          .join(bnd, Seq(keyCol, "__slice"), "left")
        val wPrev = Window.partitionBy(col(keyCol))
          .orderBy(col("__slice").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wNext = Window.partitionBy(col(keyCol))
          .orderBy(col("__slice").asc)
          .rowsBetween(1, Window.unboundedFollowing)
        val carried = spine
          .withColumn("__prevp",
            last(col("__bndb"), ignoreNulls = true).over(wPrev))
          .withColumn("__nextp",
            first(col("__bndf"), ignoreNulls = true).over(wNext))
          .select(col(keyCol), col("__slice"), col("__prevp"), col("__nextp"))
        sliced.join(carried, Seq(keyCol, "__slice"), "left")
    }
    def bwd: Column =
      if (timeSliceMicros.isEmpty) carry(col(tsCol).asc)
      else coalesce(carry(col(tsCol).asc), col("__prevp"))
    def fwd: Column =
      if (timeSliceMicros.isEmpty) carry(col(tsCol).desc)
      else coalesce(carry(col(tsCol).desc), col("__nextp"))
    val withAsof = direction match {
      case "backward" => withBoundary.withColumn("__asof", bwd)
      case "forward" => withBoundary.withColumn("__asof", fwd)
      case "nearest" =>
        // Deltas on exact integer microseconds (unix_micros), matching
        // the oracle's epoch_us arithmetic bit-for-bit. (A seconds-as-
        // double cast rounds by up to ~0.12 µs at realistic epochs —
        // micros/1e6 is not exactly representable — which can flip an
        // exact two-sided tie away from the pinned backward preference.)
        val db = unix_micros(col(tsCol)) - unix_micros(col("__b.__rts"))
        val df_ = unix_micros(col("__f.__rts")) - unix_micros(col(tsCol))
        withBoundary
          .withColumn("__b", bwd)
          .withColumn("__f", fwd)
          .withColumn("__asof",
            when(col("__f").isNull, col("__b"))
              .when(col("__b").isNull, col("__f"))
              .when(db <= df_, col("__b"))
              .otherwise(col("__f")))
    }
    val carried = withAsof.where(col("__side") === 1)
    payloadCols.foldLeft(carried) { (df, c) =>
      // null-ts left rows match nothing (see rTagged note)
      df.withColumn(s"asof_$c",
        when(col(tsCol).isNotNull, col(s"__asof.__p.$c")))
    }.select((leftCols.map(col) ++ payloadCols.map(c => col(s"asof_$c"))): _*)
  }
}
