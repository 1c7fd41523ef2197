package graft.functions

import java.lang.reflect.{InvocationHandler, Method, Modifier, Proxy}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** FLIP-311 stored procedures, bridged reflectively — the fourth-plus
  * kind of user code after the scalar/table/aggregate/table-aggregate
  * function bridges ([U] flink-table-common
  * `procedures/Procedure.java`: a class with public
  * `T[] call(ProcedureContext ctx, args...)` methods, provided by a
  * CATALOG in Flink). No catalog here ships procedures, so
  * registration is the porting seam: `CREATE PROCEDURE name AS
  * 'class.Name'` (a documented graft extension standing in for catalog
  * provisioning — Flink itself has no CREATE PROCEDURE DDL) or the
  * [[register]] API, then Flink's own `CALL name(args...)` /
  * `SHOW PROCEDURES` statements run unchanged.
  *
  * Duck-typed like the function bridges: the class needs a no-arg
  * constructor and at least one public `call` method whose FIRST
  * parameter is the context slot. The context argument passed is
  * `null` for an `Object`/class-typed slot and a dynamic proxy for an
  * interface-typed slot (a ProcedureContext interface from the user's
  * jar loads fine; any method invoked on it fails typed — the
  * reference's StreamExecutionEnvironment has no analog here, and
  * procedures that only orchestrate table state never touch it).
  * Arguments are evaluated by Spark SQL (`SELECT <args>`), so literals,
  * casts, and scalar functions all work, then coerce to the chosen
  * overload's parameter types with the same Java-widening rules as the
  * eval bridges. The returned array/iterable becomes a one-column
  * `result` DataFrame (scalar elements keep their type; anything else
  * renders via toString — Flink also renders procedure output as rows).
  */
object ReflectiveProcedure {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, String]]()

  private def registry(spark: SparkSession) = bySession.synchronized {
    var m = bySession.get(spark)
    if (m == null) { m = new java.util.HashMap[String, String](); bySession.put(spark, m) }
    m
  }

  private def callMethods(cls: Class[_]): Array[Method] =
    cls.getMethods.filter(m => m.getName == "call" &&
      Modifier.isPublic(m.getModifiers) && m.getParameterCount >= 1)

  /** Register `name` if `className` loads and has a public call method
    * with a leading context parameter; false if the shape is absent
    * (the caller surfaces its own guidance).
    */
  def register(spark: SparkSession, name: String, className: String): Boolean = {
    val cls =
      try org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
      catch { case _: ClassNotFoundException => return false }
    if (callMethods(cls).isEmpty) return false
    registry(spark).put(name.toLowerCase, className)
    true
  }

  def unregister(spark: SparkSession, name: String): Unit =
    registry(spark).remove(name.toLowerCase)

  def isRegistered(spark: SparkSession, name: String): Boolean =
    registry(spark).containsKey(name.toLowerCase)

  def registered(spark: SparkSession): Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry(spark).keySet().asScala.toSeq.sorted
  }

  /** Execute `CALL name(argsSql)` — see the class doc. */
  def call(spark: SparkSession, name: String, argsSql: String): DataFrame = {
    val className = Option(registry(spark).get(name.toLowerCase)).getOrElse(
      throw new IllegalArgumentException(s"procedure '$name' is not registered"))
    val cls = org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
    val args: Array[AnyRef] =
      if (argsSql.trim.isEmpty) Array.empty
      else {
        val row = spark.sql(s"SELECT $argsSql").head()
        Array.tabulate(row.length)(i => row.get(i).asInstanceOf[AnyRef])
      }
    val m = callMethods(cls).find(_.getParameterCount == args.length + 1).getOrElse(
      throw new IllegalArgumentException(
        s"procedure '$name' ($className) has no public call method taking " +
          s"a context + ${args.length} argument(s); available arities: " +
          callMethods(cls).map(_.getParameterCount - 1).sorted.mkString(", ")))
    val params = m.getParameterTypes
    val ctx: AnyRef =
      if (params(0).isInterface)
        Proxy.newProxyInstance(params(0).getClassLoader, Array(params(0)),
          new InvocationHandler {
            def invoke(proxy: Any, method: Method, a: Array[AnyRef]): AnyRef =
              method.getName match {
                case "toString" => s"graft-procedure-context($name)"
                case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
                case "equals" => java.lang.Boolean.valueOf(a != null && (a(0) eq proxy.asInstanceOf[AnyRef]))
                case other => throw new UnsupportedOperationException(
                  s"ProcedureContext.$other is not available here — the reference's " +
                    "execution-environment handle has no analog; procedures that " +
                    "need it must be ported to a graft operator")
              }
          })
      else null
    val coerced = new Array[AnyRef](args.length + 1)
    coerced(0) = ctx
    var i = 0
    while (i < args.length) {
      coerced(i + 1) = EvalCoercion.coerce(params(i + 1), args(i)); i += 1
    }
    val inst =
      if (Modifier.isStatic(m.getModifiers)) null
      else cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    val out =
      try m.invoke(inst, coerced: _*)
      catch {
        case e: java.lang.reflect.InvocationTargetException =>
          throw Option(e.getCause).getOrElse(e)
      }
    val elems: Seq[Any] = out match {
      case null => Seq.empty
      case a: Array[_] => a.toSeq
      case it: java.lang.Iterable[_] =>
        import scala.jdk.CollectionConverters._
        it.asScala.toSeq
      case it: Iterable[_] => it.toSeq
      case one => Seq(one)
    }
    import spark.implicits._
    elems.headOption match {
      case Some(_: String) => elems.map(_.asInstanceOf[String]).toDF("result")
      case Some(_: java.lang.Long) =>
        elems.map(_.asInstanceOf[java.lang.Long].longValue).toDF("result")
      case Some(_: java.lang.Integer) =>
        elems.map(_.asInstanceOf[java.lang.Integer].longValue).toDF("result")
      case Some(_: java.lang.Double) =>
        elems.map(_.asInstanceOf[java.lang.Double].doubleValue).toDF("result")
      case Some(_: java.lang.Boolean) =>
        elems.map(_.asInstanceOf[java.lang.Boolean].booleanValue).toDF("result")
      case Some(_) => elems.map(String.valueOf(_)).toDF("result")
      case None => Seq.empty[String].toDF("result")
    }
  }
}
