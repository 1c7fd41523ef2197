package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for graft's custom Catalyst expressions.
  *
  * Spark 4's unified `Column` no longer wraps an `Expression` publicly;
  * the classic converters (`org.apache.spark.sql.classic.ExpressionUtils`)
  * are `private[sql]`. This shim re-exports exactly the two conversions a
  * library needs to expose a native `Expression` as a user-facing
  * `Column` (e.g. graft.functions.DotProduct).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a SQL-callable temp
    * function (the `FunctionRegistry` is likewise session-internal).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Load a class through the executor-side Spark classloader chain
    * (context classloader first — task threads carry ADD JAR'd jars —
    * then Spark's own). `Utils` is `private[spark]`, hence bridged here.
    * STREAMING micro-batch threads in local mode don't carry the
    * session-jar context loader, so in-JVM execution falls back to the
    * active session's shared jar classloader (on a real cluster ADD JAR
    * ships the jar into the executor loader, so the first path holds;
    * executor-side there is no session and the fallback is skipped).
    */
  def loadTaskClass(name: String): Class[_] =
    try Class.forName(name, true, org.apache.spark.util.Utils.getContextOrSparkClassLoader)
    catch {
      case e: ClassNotFoundException =>
        SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
          case Some(s) => Class.forName(name, true,
            s.asInstanceOf[classic.SparkSession].sharedState.jarClassLoader)
          case None => throw e
        }
    }

  /** Load a class at DRIVER/registration time: the session's shared jar
    * classloader (where SQL `ADD JAR` lands) first, then the task chain.
    */
  def loadSessionClass(spark: SparkSession, name: String): Class[_] =
    try Class.forName(name, true,
      spark.asInstanceOf[classic.SparkSession].sharedState.jarClassLoader)
    catch { case _: ClassNotFoundException => loadTaskClass(name) }

  /** Alias an existing session function (builtin, graft-registered, or
    * temp) under a new name — the mapping behind the dialect's
    * `CREATE FUNCTION name AS 'impl'`. Returns false when the target
    * does not resolve (caller raises the migration-guidance error).
    */
  def aliasFunction(spark: SparkSession, alias: String, target: String): Boolean = {
    val reg = spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    reg.lookupFunctionBuilder(
      org.apache.spark.sql.catalyst.FunctionIdentifier(target.toLowerCase)) match {
      case Some(b) => reg.createOrReplaceTempFunction(alias, b, "scala_udf"); true
      case None => false
    }
  }

  /** Drop a temp function (dialect `DROP FUNCTION`); false if absent. */
  def dropTempFunction(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name.toLowerCase))

  /** Clone a session — same SparkContext and a COPY of the session
    * state, so conf overrides scoped to an operator (e.g. the
    * connected-components loop) never leak into the caller's session.
    * (`cloneSession` is `private[sql]` on the classic session.)
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Execute an already-parsed logical plan (`Dataset.ofRows` is
    * `private[sql]`) — lets a custom parser's output run on a session
    * that was built WITHOUT `spark.sql.extensions`.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
