package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side runtime of the broadcast deletion-vector filter —
  * kept outside the generated code so the codegen body is two calls.
  *
  * Masks are keyed by BARE file name (what the sidecars record); rows
  * arrive with the scan's full `_metadata.file_path`, so the name is
  * sliced off once per FILE CHANGE (the caller memoizes on the path),
  * never per row. Per-row cost is one pointer/equality check plus a
  * binary search of the file's sorted positions — no join build, no
  * hashing, and the scan stays in one whole-stage-codegen loop. */
object DvMaskRuntime {
  /** The file's sorted deleted positions, or null when unmasked. */
  def positionsFor(masks: Map[String, Array[Long]],
      path: UTF8String): Array[Long] = {
    val s = path.toString
    masks.getOrElse(s.substring(s.lastIndexOf('/') + 1), null)
  }

  /** TRUE when the row at `pos` is NOT deleted. */
  def survives(arr: Array[Long], pos: Long): Boolean =
    (arr eq null) || java.util.Arrays.binarySearch(arr, pos) < 0
}

/** TRUE when `(filePath, rowIndex)` is not in the broadcast deletion
  * mask — the map-side form of the DV anti-join (custom-operator
  * ladder step (b): a codegen'd Expression inside the scan's
  * whole-stage loop, vs a join operator after it). The mask rides an
  * ordinary Spark broadcast: one copy per executor, resolved once per
  * partition, memoized per file within the partition (parquet rows
  * stream file-by-file, so the name slice + map lookup amortize to
  * once per file). [[graft.operators.VersionedTable]] bounds what is
  * loaded into the broadcast and falls back to the anti-join beyond
  * the bound — this expression never sees a pathological mask. */
case class DvSurvives(left: Expression, right: Expression,
    masks: Broadcast[Map[String, Array[Long]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dv_survives needs (string file_path, bigint row_index), " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_survives"

  @transient private var masksLocal: Map[String, Array[Long]] = _
  @transient private var lastPath: UTF8String = _
  @transient private var lastArr: Array[Long] = _

  override def nullSafeEval(p: Any, i: Any): Any = {
    val path = p.asInstanceOf[UTF8String]
    if (masksLocal == null) masksLocal = masks.value
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastArr = DvMaskRuntime.positionsFor(masksLocal, path)
    }
    DvMaskRuntime.survives(lastArr, i.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, i) => {
      val mapCls = "scala.collection.immutable.Map"
      val bcRef = ctx.addReferenceObj("dvMasksBc", masks,
        classOf[Broadcast[_]].getName)
      val masksVar = ctx.addMutableState(mapCls, "dvMasks",
        v => s"$v = ($mapCls) $bcRef.value();")
      val lastPath = ctx.addMutableState(
        "org.apache.spark.unsafe.types.UTF8String", "dvLastPath")
      val lastArr = ctx.addMutableState("long[]", "dvLastArr")
      s"""
         |if ($lastPath == null || !$lastPath.equals($p)) {
         |  $lastPath = $p.clone();
         |  $lastArr = graft.functions.DvMaskRuntime.positionsFor(
         |    $masksVar, $p);
         |}
         |${ev.value} = graft.functions.DvMaskRuntime.survives(
         |  $lastArr, $i);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvSurvives =
    copy(left = newLeft, right = newRight)
}
