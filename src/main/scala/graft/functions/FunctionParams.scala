package graft.functions

import org.apache.spark.sql.SparkSession

/** Session registry of reflective functions' SQL-invocable parameter
  * names — the FLIP-387 named-argument surface for `CREATE FUNCTION`
  * bridges ([U] flink-table-common `annotation/ArgumentHint`: Flink
  * reads names off hints or the compiled parameter names; here the
  * bridges record `eval`'s reflected names at registration, which javac
  * preserves under `-parameters`). [[graft.plans.NamedArgs]] consults
  * this to map `f(pname => expr, ...)` invocations onto the positional
  * bridge before Spark parses the statement. Names recorded only when
  * the compiler kept them — otherwise the invocation fails typed with
  * the `-parameters` guidance.
  */
object FunctionParams {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, Seq[String]]]()

  private def registry(spark: SparkSession) = bySession.synchronized {
    var m = bySession.get(spark)
    if (m == null) { m = new java.util.HashMap[String, Seq[String]](); bySession.put(spark, m) }
    m
  }

  /** Record the invocable parameter names (lowercased) for `name` when
    * the reflected method kept them; records an absence marker
    * otherwise so the rewrite can explain WHY names don't work.
    */
  def record(spark: SparkSession, name: String,
      params: Seq[java.lang.reflect.Parameter]): Unit =
    put(spark, name,
      if (params.forall(_.isNamePresent)) Some(params.map(_.getName.toLowerCase))
      else None)

  /** Direct registration (None = recorded without compiled names) —
    * the bridges go through [[record]]; exposed for specs.
    */
  private[graft] def put(spark: SparkSession, name: String,
      names: Option[Seq[String]]): Unit =
    registry(spark).put(name.toLowerCase, names.orNull)

  /** Some(names) when `name` is a recorded function with usable names;
    * Some(null) when recorded without compiled names; None when unknown.
    */
  def paramsOf(spark: SparkSession, name: String): Option[Seq[String]] =
    if (registry(spark).containsKey(name.toLowerCase))
      Some(registry(spark).get(name.toLowerCase))
    else None

  def remove(spark: SparkSession, name: String): Unit =
    registry(spark).remove(name.toLowerCase)
}
