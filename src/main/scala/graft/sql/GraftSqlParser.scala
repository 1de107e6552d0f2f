package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session parser wrapper (the `injectParser` seam): applies the
  * [[MatchRecognizeSql]] source-to-source rewrite to statement text so
  * Trino's `MATCH_RECOGNIZE` clause parses in plain `spark.sql(...)`
  * — the SQL-Lab-user path — then delegates everything to Spark's own
  * parser. Statements without the keyword pass through at the cost of
  * one uppercase scan. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private def rw(t: String): String =
    UnnestSql.rewrite(JsonTableSql.rewrite(MatchRecognizeSql.rewrite(t)))
  override def parsePlan(sqlText: String): LogicalPlan = delegate.parsePlan(rw(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(rw(sqlText))
  // must forward EXPLICITLY: the interface default discards the
  // parameter context (falls back to bare parsePlan), which unbinds
  // every named parameter of spark.sql(text, args)
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(rw(sqlText), ctx)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
