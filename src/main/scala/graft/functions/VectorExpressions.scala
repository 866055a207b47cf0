package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (custom-operator
  * ladder step (b): a codegen'd `Expression` beats a Scala UDF).
  *
  * The similarity/dedup pipelines evaluate dot products and norms over
  * millions of array pairs; a UDF pays per-row Seq[Double] boxing and a
  * lambda call, while these expressions read `ArrayData` primitives
  * directly inside whole-stage codegen — the generated Java sits in the
  * same JIT-compiled loop as the surrounding operators.
  *
  * Accumulation is a strict ascending-index fold (same IEEE op order as
  * the UDFs they replace and DuckDB's list_reduce), so results remain
  * bit-identical for the correctness oracles. Null ELEMENTS inside the
  * arrays are not supported (embedding contract); null arrays propagate
  * null via nullSafeEval/nullSafeCodeGen.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot needs array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of an array<double>, ascending-index accumulation. */
case class ArrayNorm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"array_norm needs array<double>, got ${t.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { s += x.getDouble(i) * x.getDouble(i); i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $s += $a.getDouble($i) * $a.getDouble($i);
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNorm =
    copy(child = newChild)
}

/** First 15 hex chars of a (md5-hex) string as a double in [0, 2^60) —
  * the portable-Bernoulli draw primitive. Replaces
  * `conv(substring(s, 1, 15), 16, 10).cast("double")`, whose
  * arbitrary-base `conv` + decimal-string re-parse measured ~2 µs/row
  * (dominating every hash-threshold operator); this is a 15-iteration
  * nibble loop inside whole-stage codegen. Value-identical: both round
  * the same exact ≤60-bit integer to nearest double, which is also what
  * DuckDB's `CAST(('0x' || substr(md5(..), 1, 15)) AS UBIGINT)::DOUBLE`
  * produces.
  *
  * CONTRACT: input must be lowercase-hex (md5/sha output). The nibble
  * loop is deliberately unvalidated — it sits inside the per-row hot
  * path — so non-hex characters map to garbage nibbles, not errors. */
case class Hex60ToDouble(child: Expression)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StringType, DoubleType => DT}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hex60_to_double needs a string, got ${t.simpleString}")
    }
  override def dataType: DataType = DT
  override def prettyName: String = "hex60_to_double"

  override def nullSafeEval(a: Any): Any = {
    val s = a.toString
    var v = 0L
    var i = 0
    while (i < 15 && i < s.length) {
      val c = s.charAt(i)
      val d = if (c <= '9') c - '0'
              else if (c <= 'F') c - 'A' + 10
              else c - 'a' + 10
      v = (v << 4) | d
      i += 1
    }
    v.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |String $s = $a.toString();
         |long $v = 0L;
         |for (int $i = 0; $i < 15 && $i < $s.length(); $i++) {
         |  char $c = $s.charAt($i);
         |  int $d = $c <= '9' ? $c - '0'
         |    : ($c <= 'F' ? $c - 'A' + 10 : $c - 'a' + 10);
         |  $v = ($v << 4) | $d;
         |}
         |${ev.value} = (double) $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Hex60ToDouble =
    copy(child = newChild)
}

/** First 15 hex chars → exact long in [0, 2^60) — [[Hex60ToDouble]]'s
  * sibling for call sites needing an EXACT integral key (bloom/join
  * keys), where the double form's >2^53 rounding would merge distinct
  * hashes. Replaces `conv(substr(md5, 1, 15), 16, 10).cast(long)`
  * (~2 µs/row through BigInteger) in the content-hash scans. */
case class Hex60ToLong(child: Expression)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{StringType, LongType => LT}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hex60_to_long needs a string, got ${t.simpleString}")
    }
  override def dataType: DataType = LT
  override def prettyName: String = "hex60_to_long"

  override def nullSafeEval(a: Any): Any = {
    val s = a.toString
    var v = 0L
    var i = 0
    while (i < 15 && i < s.length) {
      val c = s.charAt(i)
      val d = if (c <= '9') c - '0'
              else if (c <= 'F') c - 'A' + 10
              else c - 'a' + 10
      v = (v << 4) | d
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |String $s = $a.toString();
         |long $v = 0L;
         |for (int $i = 0; $i < 15 && $i < $s.length(); $i++) {
         |  char $c = $s.charAt($i);
         |  int $d = $c <= '9' ? $c - '0'
         |    : ($c <= 'F' ? $c - 'A' + 10 : $c - 'a' + 10);
         |  $v = ($v << 4) | $d;
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Hex60ToLong =
    copy(child = newChild)
}

object VectorFunctions {
  /** dot(a, b) as a Column (codegen'd native expression). */
  def array_dot(a: Column, b: Column): Column =
    Bridge.column(ArrayDot(expression(a), expression(b)))

  /** ||a||₂ as a Column. */
  def array_norm(a: Column): Column =
    Bridge.column(ArrayNorm(expression(a)))

  /** First 15 hex chars of a string → double in [0, 2^60). */
  def hex60_to_double(a: Column): Column =
    Bridge.column(Hex60ToDouble(expression(a)))

  /** First 15 hex chars of a string → EXACT long in [0, 2^60). */
  def hex60_to_long(a: Column): Column =
    Bridge.column(Hex60ToLong(expression(a)))

  /** cosine(a, b) with the exact op order of the DuckDB oracle:
    * dot / (norm(a) * norm(b)). */
  def array_cosine(a: Column, b: Column): Column =
    array_dot(a, b) / (array_norm(a) * array_norm(b))

  private def expression(c: Column): Expression = Bridge.expression(c)
}
