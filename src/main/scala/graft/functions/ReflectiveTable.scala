package graft.functions

import java.lang.reflect.{Method, Modifier, ParameterizedType, Type}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java._
import org.apache.spark.sql.types._

/** Reflective TABLE-function bridge for `CREATE FUNCTION name AS
  * 'class'` — the Flink `TableFunction` calling convention ([U]
  * flink-table-common `functions/TableFunction.java`): a
  * no-arg-constructible class whose `eval` emits ZERO OR MORE rows per
  * input row, consumed through `LATERAL TABLE(f(x))`. flink-table is
  * not on this classpath (so `extends TableFunction<T>` cannot load);
  * the contract is duck-typed on the eval shape, which also admits
  * plain POJO UDTFs. Two shapes register:
  *
  *  - **returning eval**: `eval` returns `java.lang.Iterable<T>`,
  *    `java.util.Iterator<T>`, or `T[]` — each element is one emitted
  *    row (the zero-dependency POJO port of a Flink UDTF);
  *  - **collect-style eval**: `void eval(...)` plus a public field
  *    `collector` of type `java.util.function.Consumer<T>` — the
  *    mechanical port of Flink's shape: delete `extends
  *    TableFunction<T>`, declare the field, rewrite `collect(x)` to
  *    `collector.accept(x)`. The bridge injects a buffering consumer
  *    per executor thread (one instance per thread, so concurrent
  *    tasks never interleave emissions).
  *
  * Declared subset (typed errors inside the shape): exactly one public
  * `eval`, arity ≤ 6, parameters from the scalar bridge's type set,
  * SCALAR row type `T` (one output column — the split/explode shape;
  * multi-column UDTFs port to `inline`/`posexplode` after migration)
  * read from the generic signature (array component / `Iterable<T>` /
  * `Consumer<T>` type argument).
  *
  * The registered Spark function returns `ARRAY<T>` — `LATERAL
  * TABLE(f(x)) AS t(c)` lowers onto `LATERAL VIEW explode(f(x)) t AS c`
  * (see [[graft.plans.TemporalFunctions.rewrite]]), Spark's native
  * generator path, so the per-row fan-out runs inside codegen'd
  * Generate, not a custom operator.
  */
object ReflectiveTable {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // session registry: lowercased names registered as table functions —
  // the LATERAL TABLE rewrite consults it to pick the explode lowering
  private val registryBySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()
  private def registry(spark: SparkSession) = registryBySession.synchronized {
    var s = registryBySession.get(spark)
    if (s == null) { s = new java.util.HashSet[String](); registryBySession.put(spark, s) }
    s
  }

  def isTableFunction(spark: SparkSession, name: String): Boolean =
    registryBySession.synchronized(registry(spark).contains(name.toLowerCase))

  def unregister(spark: SparkSession, name: String): Unit =
    registryBySession.synchronized { registry(spark).remove(name.toLowerCase); () }

  private def genericArg(t: Type): Option[Class[_]] = t match {
    case p: ParameterizedType => p.getActualTypeArguments.headOption.collect {
      case c: Class[_] => c
    }
    case _ => None
  }

  private def collectorField(cls: Class[_]) =
    cls.getFields.find(f => f.getName == "collector" &&
      classOf[java.util.function.Consumer[_]].isAssignableFrom(f.getType) &&
      !Modifier.isStatic(f.getModifiers) && !Modifier.isFinal(f.getModifiers))

  /** Register `name` over `impl`'s table-shaped `eval` if the class
    * resolves and IS table-shaped. Returns false when the class does
    * not resolve, has no single public `eval`, or the eval is
    * scalar-shaped (the scalar bridge's domain); fails typed when it is
    * table-shaped but outside the subset.
    */
  def register(spark: SparkSession, name: String, impl: String): Boolean = {
    val cls =
      try org.apache.spark.sql.GraftColumnBridge.loadSessionClass(spark, impl)
      catch {
        case _: ClassNotFoundException | _: NoClassDefFoundError => return false
      }
    val evals = ReflectiveScalar.publicEvals(cls)
    if (evals.length != 1) return false // absent/overloaded: scalar bridge's errors
    val m = evals.head
    val rt = m.getReturnType
    val isVoid = rt == java.lang.Void.TYPE
    val isIterableRet = classOf[java.lang.Iterable[_]].isAssignableFrom(rt) ||
      classOf[java.util.Iterator[_]].isAssignableFrom(rt) || rt.isArray
    if (!isVoid && !isIterableRet) return false // scalar-shaped
    if (!Modifier.isStatic(m.getModifiers))
      try cls.getDeclaredConstructor()
      catch {
        case _: NoSuchMethodException =>
          fail(s"CREATE FUNCTION $name AS '$impl': the class needs a public " +
            "no-arg constructor (Flink's TableFunction contract)")
      }
    val field = collectorField(cls)
    if (isVoid && field.isEmpty)
      fail(s"CREATE FUNCTION $name AS '$impl': a void eval emits through a " +
        "public java.util.function.Consumer field named 'collector' — port " +
        "Flink's TableFunction by declaring the field and rewriting " +
        "collect(x) to collector.accept(x) (or return an Iterable/array)")
    val elemClass: Class[_] =
      (if (rt.isArray) Some(rt.getComponentType)
       else if (isVoid) genericArg(field.get.getGenericType)
       else genericArg(m.getGenericReturnType))
        .getOrElse(fail(s"CREATE FUNCTION $name AS '$impl': cannot read the " +
          "emitted row type — use a typed array return, or a generic " +
          s"Iterable<T>/Consumer<T> signature (raw types erase T)"))
    val elemType = ReflectiveScalar.typeTable.getOrElse(elemClass,
      fail(s"CREATE FUNCTION $name AS '$impl': emitted rows of type " +
        s"${elemClass.getName} are unsupported — one SCALAR column per row " +
        "(primitives/boxes, String, byte[], BigDecimal, Timestamp, Date); " +
        "multi-column UDTFs port to inline/posexplode"))
    m.getParameterTypes.zipWithIndex.foreach { case (p, i) =>
      if (ReflectiveScalar.typeTable.get(p).isEmpty)
        fail(s"CREATE FUNCTION $name AS '$impl': eval parameter ${i + 1} has " +
          s"unsupported type ${p.getName}")
    }
    val ret = DataTypes.createArrayType(elemType)
    val b = new TableEvalBridge(impl)
    m.getParameterCount match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        override def call(): Any = b(Array.empty) }, ret)
      case 1 => spark.udf.register(name, new UDF1[AnyRef, Any] {
        override def call(a1: AnyRef): Any = b(Array(a1)) }, ret)
      case 2 => spark.udf.register(name, new UDF2[AnyRef, AnyRef, Any] {
        override def call(a1: AnyRef, a2: AnyRef): Any = b(Array(a1, a2)) }, ret)
      case 3 => spark.udf.register(name, new UDF3[AnyRef, AnyRef, AnyRef, Any] {
        override def call(a1: AnyRef, a2: AnyRef, a3: AnyRef): Any =
          b(Array(a1, a2, a3)) }, ret)
      case 4 => spark.udf.register(name, new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, Any] {
        override def call(a1: AnyRef, a2: AnyRef, a3: AnyRef, a4: AnyRef): Any =
          b(Array(a1, a2, a3, a4)) }, ret)
      case 5 => spark.udf.register(name,
        new UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, Any] {
          override def call(a1: AnyRef, a2: AnyRef, a3: AnyRef, a4: AnyRef,
              a5: AnyRef): Any = b(Array(a1, a2, a3, a4, a5)) }, ret)
      case 6 => spark.udf.register(name,
        new UDF6[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, Any] {
          override def call(a1: AnyRef, a2: AnyRef, a3: AnyRef, a4: AnyRef,
              a5: AnyRef, a6: AnyRef): Any = b(Array(a1, a2, a3, a4, a5, a6)) }, ret)
      case n => fail(s"CREATE FUNCTION $name AS '$impl': eval arity $n exceeds " +
        "the bridge's maximum of 6")
    }
    registryBySession.synchronized { registry(spark).add(name.toLowerCase); () }
    true
  }
}

/** Serializable per-JVM lazy holder for a table-function class: ships
  * the class NAME; each executor THREAD gets its own instance (and, for
  * collect-style classes, its own buffering consumer wired into the
  * public `collector` field), so concurrent tasks never interleave
  * emissions.
  */
private final class TableEvalBridge(className: String) extends Serializable {
  @transient private lazy val local =
    new ThreadLocal[(AnyRef, Method, scala.collection.mutable.ArrayBuffer[AnyRef])] {
      override def initialValue() = {
        val cls = org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
        val m = ReflectiveScalar.publicEvals(cls).head
        val inst =
          if (Modifier.isStatic(m.getModifiers)) null
          else cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
        val buf = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
        if (m.getReturnType == java.lang.Void.TYPE) {
          val f = cls.getFields.find(f => f.getName == "collector" &&
            classOf[java.util.function.Consumer[_]].isAssignableFrom(f.getType)).get
          f.set(inst, new java.util.function.Consumer[AnyRef] {
            override def accept(x: AnyRef): Unit = { buf += x; () }
          })
        }
        (inst, m, buf)
      }
    }

  def apply(args: Array[AnyRef]): AnyRef = {
    val (inst, m, buf) = local.get()
    val params = m.getParameterTypes
    val coerced = new Array[AnyRef](args.length)
    var i = 0
    while (i < args.length) { coerced(i) = EvalCoercion.coerce(params(i), args(i)); i += 1 }
    if (m.getReturnType == java.lang.Void.TYPE) {
      buf.clear()
      m.invoke(inst, coerced: _*)
      buf.toSeq
    } else m.invoke(inst, coerced: _*) match {
      case null => null
      case a: Array[_] => a.toSeq.asInstanceOf[Seq[AnyRef]]
      case it: java.util.Iterator[_] =>
        val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
        while (it.hasNext) out += it.next().asInstanceOf[AnyRef]
        out.toSeq
      case it: java.lang.Iterable[_] =>
        val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
        val i2 = it.iterator()
        while (i2.hasNext) out += i2.next().asInstanceOf[AnyRef]
        out.toSeq
      case other => fail(s"table function $className emitted $other")
    }
  }

  private def fail(msg: String): Nothing = throw new IllegalStateException(msg)
}
