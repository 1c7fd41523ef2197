package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser injected by `graft.GraftExtensions` (the SparkSessionExtensions
  * `injectParser` hook — Spark's public custom-dialect entry point).
  * Statement routing, in order: connector DDL and INSERT INTO registered
  * sinks execute via [[FlinkDdl]]; legacy group windows
  * ([[LegacyGroupWindow]]) lower onto the window TVFs; TVF spans
  * ([[WindowTvf]]) become plain-Spark subqueries; MATCH_RECOGNIZE routes
  * through [[MatchRecognize.sql]]; `FOR SYSTEM_TIME AS OF` through
  * [[SystemTimeJoin.sql]]; everything else delegates to Spark's parser
  * untouched, so the dialect is a strict superset. (`graft.FlinkSql`
  * drives the same chain without session extensions.)
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def viaMr(sqlText: String): LogicalPlan =
    MatchRecognize.sql(session, sqlText).queryExecution.logical

  private def tvf(sqlText: String): String = {
    // legacy group windows lower onto the TVF form, so they run first
    val lowered =
      if (LegacyGroupWindow.containsClause(sqlText)) LegacyGroupWindow.rewrite(sqlText)
      else sqlText
    if (WindowTvf.containsClause(lowered)) WindowTvf.rewrite(lowered) else lowered
  }

  override def parsePlan(sqlText: String): LogicalPlan = {
    if (FlinkDdl.containsClause(sqlText)) {
      // connector DDL registers its view eagerly; the statement itself
      // resolves to Flink's `OK` result row
      val name = FlinkDdl.execute(session, sqlText)
      return delegate.parsePlan(s"SELECT 'OK' AS result, '$name' AS table_name")
    }
    if (FlinkDdl.isInsert(sqlText)) {
      val n = FlinkDdl.executeInsert(session, sqlText)
      return delegate.parsePlan(s"SELECT 'OK' AS result, ${n}L AS rows_sunk")
    }
    val t = tvf(sqlText)
    if (MatchRecognize.containsClause(t)) viaMr(t)
    else if (SystemTimeJoin.containsClause(t))
      SystemTimeJoin.sql(session, t).queryExecution.logical
    else delegate.parsePlan(t)
  }

  override def parseQuery(sqlText: String): LogicalPlan = {
    val t = tvf(sqlText)
    if (MatchRecognize.containsClause(t)) viaMr(t)
    else if (SystemTimeJoin.containsClause(t))
      SystemTimeJoin.sql(session, t).queryExecution.logical
    else delegate.parseQuery(t)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
