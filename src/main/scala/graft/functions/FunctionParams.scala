package graft.functions

import org.apache.spark.sql.SparkSession

/** Session registry of reflective functions' SQL-invocable parameter
  * names — the FLIP-387 named-argument surface for `CREATE FUNCTION`
  * bridges ([U] flink-table-common `annotation/ArgumentHint`: Flink
  * reads names off hints or the compiled parameter names; here the
  * bridges record `eval`'s parameters at registration — the hint's
  * `name` wins over the compiled name, so hinted classes work even
  * without `javac -parameters`, and the hint's `isOptional` lets a
  * named invocation omit the parameter). [[graft.plans.NamedArgs]]
  * consults this to map `f(pname => expr, ...)` invocations onto the
  * positional bridge before Spark parses the statement, filling SQL
  * NULL for omitted optional parameters (Flink's default-less optional
  * arguments are null-filled the same way; a primitive slot then fails
  * typed at eval, as in Flink — optional parameters must be nullable).
  * Names recorded only when the hint or compiler kept them — otherwise
  * the invocation fails typed with the `-parameters` guidance.
  */
object FunctionParams {

  /** One SQL-invocable parameter: its name and whether a named call
    * may omit it.
    */
  final case class Param(name: String, optional: Boolean)

  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, Seq[Param]]]()

  private def registry(spark: SparkSession) = bySession.synchronized {
    var m = bySession.get(spark)
    if (m == null) { m = new java.util.HashMap[String, Seq[Param]](); bySession.put(spark, m) }
    m
  }

  /** Duck-read a Flink-style `@ArgumentHint` off a reflected parameter:
    * any retained annotation whose simple name is ArgumentHint, with
    * `name()` / `isOptional()` members ([U] flink-table-common
    * `annotation/ArgumentHint`). The user's jar carries its own copy of
    * the annotation class — loaded through the session classloader, it
    * cannot be referenced statically, hence the duck typing (the same
    * convention as the reflective eval bridges themselves).
    */
  def paramDef(p: java.lang.reflect.Parameter): Option[Param] = {
    val hint = p.getAnnotations.find(
      _.annotationType.getSimpleName == "ArgumentHint")
    def read[T](a: java.lang.annotation.Annotation, m: String, dflt: T): T =
      try a.annotationType.getMethod(m).invoke(a).asInstanceOf[T]
      catch { case _: ReflectiveOperationException => dflt }
    hint match {
      case Some(a) =>
        val nm = read[String](a, "name", "")
        val opt = read[java.lang.Boolean](a, "isOptional",
          java.lang.Boolean.FALSE) == java.lang.Boolean.TRUE
        val resolved =
          if (nm != null && nm.nonEmpty) Some(nm)
          else if (p.isNamePresent) Some(p.getName)
          else None
        resolved.map(n => Param(n.toLowerCase, opt))
      case None =>
        if (p.isNamePresent) Some(Param(p.getName.toLowerCase, optional = false))
        else None
    }
  }

  /** Record the invocable parameters (lowercased names + optionality)
    * for `name` when the hint or reflected method kept names; records
    * an absence marker otherwise so the rewrite can explain WHY names
    * don't work.
    */
  def record(spark: SparkSession, name: String,
      params: Seq[java.lang.reflect.Parameter]): Unit = {
    val defs = params.map(paramDef)
    registry(spark).put(name.toLowerCase,
      if (defs.forall(_.isDefined)) defs.map(_.get) else null)
  }

  /** Direct registration (None = recorded without compiled names) —
    * the bridges go through [[record]]; exposed for specs. All
    * parameters register required; use [[putDefs]] for optional ones.
    */
  private[graft] def put(spark: SparkSession, name: String,
      names: Option[Seq[String]]): Unit =
    registry(spark).put(name.toLowerCase,
      names.map(_.map(n => Param(n.toLowerCase, optional = false))).orNull)

  private[graft] def putDefs(spark: SparkSession, name: String,
      defs: Seq[Param]): Unit =
    registry(spark).put(name.toLowerCase, defs)

  /** Some(names) when `name` is a recorded function with usable names;
    * Some(null) when recorded without compiled names; None when unknown.
    */
  def paramsOf(spark: SparkSession, name: String): Option[Seq[String]] =
    defsOf(spark, name).map(d => if (d == null) null else d.map(_.name))

  /** Like [[paramsOf]] but with per-parameter optionality. */
  def defsOf(spark: SparkSession, name: String): Option[Seq[Param]] =
    if (registry(spark).containsKey(name.toLowerCase))
      Some(registry(spark).get(name.toLowerCase))
    else None

  def remove(spark: SparkSession, name: String): Unit =
    registry(spark).remove(name.toLowerCase)
}
