package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** Parser injected by `graft.GraftExtensions` (the SparkSessionExtensions
  * `injectParser` hook — Spark's public custom-dialect entry point).
  * Statement routing, in order: connector DDL and INSERT INTO registered
  * sinks parse to lazily-run commands over [[FlinkDdl]] (side effects at
  * plan execution, never at parse); legacy group windows
  * ([[LegacyGroupWindow]]) lower onto the window TVFs; TVF spans
  * ([[WindowTvf]]) become plain-Spark subqueries; `UNNEST` joins
  * ([[UnnestRewrite]]) become LATERAL VIEW generators; MATCH_RECOGNIZE routes
  * through [[MatchRecognize.sql]]; `FOR SYSTEM_TIME AS OF` through
  * [[SystemTimeJoin.sql]]; everything else delegates to Spark's parser
  * untouched, so the dialect is a strict superset. (`graft.FlinkSql`
  * drives the same chain without session extensions.)
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def viaMr(sqlText: String): LogicalPlan =
    MatchRecognize.sql(session, sqlText).queryExecution.logical

  // Flink's batch join hints ([U] flink-table-planner JoinStrategy,
  // FLIP-229: BROADCAST / SHUFFLE_HASH / SHUFFLE_MERGE / NEST_LOOP):
  // BROADCAST and SHUFFLE_HASH are Spark's own hint names already; the
  // other two translate. Spark ignores-with-a-warning any hint it can't
  // honor, matching Flink's advisory hint semantics.
  private def joinHints(sqlText: String): String =
    raw"(?i)\bNEST_LOOP\s*\(".r.replaceAllIn(
      raw"(?i)\bSHUFFLE_MERGE\s*\(".r.replaceAllIn(sqlText, "MERGE("),
      "SHUFFLE_REPLICATE_NL(")

  private def tvf(sqlText: String): String = {
    // Flink's dynamic table options hint: applied for DDL-registered
    // tables (per-query connector override via a derived view), dropped
    // for names the registry doesn't know (other hints pass through to
    // Spark, which understands its own and warns on unknowns)
    // Flink's key-value hints (LOOKUP / STATE_TTL) carry `'k'='v'`
    // arguments Spark's hint grammar rejects — consume them first
    // STATE_TTL is per-query scope (Flink's StateTtlHint): reset the
    // recorded TTLs for every statement so none leak across statements
    FlinkHints.clearStateTtl(session)
    val noKv =
      if (FlinkHints.containsClause(sqlText)) FlinkHints.rewrite(session, sqlText)
      else sqlText
    val noOpts = joinHints(FlinkDdl.applyOptionsHints(session, noKv))
    // legacy group windows lower onto the TVF form, so they run first
    val lowered =
      if (LegacyGroupWindow.containsClause(noOpts)) LegacyGroupWindow.rewrite(noOpts)
      else noOpts
    val tvfed =
      if (WindowTvf.containsClause(lowered)) WindowTvf.rewrite(lowered) else lowered
    val unnested =
      if (UnnestRewrite.containsClause(tvfed)) UnnestRewrite.rewrite(tvfed) else tvfed
    val temporal =
      if (TemporalFunctions.containsClause(unnested))
        TemporalFunctions.rewrite(session, unnested)
      else unnested
    val jsonObj =
      if (JsonObjectRewrite.containsClause(temporal)) JsonObjectRewrite.rewrite(temporal)
      else temporal
    // ARRAY[...] / MAP[...] bracket constructors → array(...) / map(...)
    val brackets = BracketConstructors.rewrite(jsonObj)
    // FLIP-387 named arguments for bridged CREATE FUNCTION invocations
    if (NamedArgs.containsClause(brackets)) NamedArgs.rewrite(session, brackets)
    else brackets
  }

  override def parsePlan(sqlText: String): LogicalPlan = {
    // DDL / INSERT parse to lazily-run command plans (Spark executes a
    // Command when the DataFrame over it materializes, like its own DDL)
    // — parsing alone has no side effects, so EXPLAIN, plan caching, and
    // view-text re-parsing never register views or perform writes
    if (FlinkDdl.containsClause(sqlText)) return FlinkDdlCommand(sqlText)
    if (FlinkDdl.isInsert(session, sqlText)) return FlinkInsertCommand(sqlText)
    if (FlinkDdl.isDrop(session, sqlText)) return FlinkDropCommand(sqlText)
    if (FlinkDdl.isTruncate(session, sqlText)) return FlinkTruncateCommand(sqlText)
    if (FlinkDdl.isRowLevel(session, sqlText)) return FlinkRowLevelCommand(sqlText)
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

/** Flink connector `CREATE TABLE` as a lazily-run Spark command: the
  * view registration happens when the plan EXECUTES (Dataset
  * materialization / `spark.sql(...)` eager-command semantics), never
  * at parse time. Resolves to Flink's `OK` result row.
  */
case class FlinkDdlCommand(sqlText: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("result", StringType, nullable = false)(),
    AttributeReference("table_name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("OK", FlinkDdl.execute(spark, sqlText)))
}

/** `INSERT INTO <ddl sink> SELECT ...` as a lazily-run command — the
  * write happens at execution, so EXPLAIN / parse-only paths stay pure.
  */
case class FlinkInsertCommand(sqlText: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("result", StringType, nullable = false)(),
    AttributeReference("rows_sunk", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("OK", FlinkDdl.executeInsert(spark, sqlText)))
}

/** `DROP TABLE <ddl table>` — unregisters the temp view and the DDL
  * metadata at execution time (data files stay, like Flink's
  * filesystem connector).
  */
case class FlinkDropCommand(sqlText: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("result", StringType, nullable = false)(),
    AttributeReference("table_name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("OK", FlinkDdl.executeDrop(spark, sqlText)))
}

/** `TRUNCATE TABLE <ddl table>` — deletes the filesystem table's data
  * at execution time and leaves the registration in place.
  */
case class FlinkTruncateCommand(sqlText: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("result", StringType, nullable = false)(),
    AttributeReference("table_name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("OK", FlinkDdl.executeTruncate(spark, sqlText)))
}

/** Row-level `DELETE FROM` / `UPDATE ... SET` on a DDL-registered
  * filesystem table (FLIP-282) — stages the rewrite, swaps it in, and
  * reports the affected-row count at execution time.
  */
case class FlinkRowLevelCommand(sqlText: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("result", StringType, nullable = false)(),
    AttributeReference("rows_affected", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row("OK", FlinkDdl.executeRowLevel(spark, sqlText)))
}
