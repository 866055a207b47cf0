package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser adding the warehouse DDL forms Spark's
  * grammar lacks (the Delta-parser posture): `DESCRIBE HISTORY t` and
  * `DESCRIBE DETAIL t` lower onto the registered catalog procedures
  * (`CALL <catalog>.history/detail(table => '<path>')`), so SQL-only
  * users audit a table's commit log without shelling into CALL
  * syntax. Everything else passes through verbatim — including
  * `DESCRIBE <table>` for tables that happen to be NAMED `history`
  * (the rewrite fires only when a target identifier FOLLOWS the
  * keyword). Injected construction-time via
  * [[graft.GraftExtensions]]; parsers cannot be added to a live
  * session (Spark builds the session parser once), so runtime
  * `ensureRegistered` sessions keep the CALL spelling. */
final class GraftSqlParser(delegate: ParserInterface)
    extends ParserInterface {

  private val describeRe =
    """(?is)\s*DESC(?:RIBE)?\s+(HISTORY|DETAIL)\s+(\S.*?)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeRe(verb, ident) =>
      val parts = delegate.parseMultipartIdentifier(ident)
      require(parts.size == 2,
        s"DESCRIBE ${verb.toUpperCase} expects <catalog>.<table>, " +
          s"got: $ident")
      // tables ARE paths in the graft catalog: part 2 goes to the
      // procedure's `table` argument verbatim (quotes doubled)
      val path = parts(1).replace("'", "''")
      val cat = "`" + parts.head.replace("`", "``") + "`"
      delegate.parsePlan(
        s"CALL $cat.${verb.toLowerCase}(table => '$path')")
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
