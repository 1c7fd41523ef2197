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
  * row type `T` read from the generic signature (array component /
  * `Iterable<T>` / `Consumer<T>` type argument) and either a supported
  * SCALAR (one output column — the split/explode shape) or a RESULT
  * CLASS whose public fields are all supported scalars (multi-column
  * rows in field declaration order — Flink's Row-typed TableFunction
  * ported as a plain POJO).
  *
  * The registered Spark function returns `ARRAY<T>` (`ARRAY<STRUCT>`
  * for POJO rows) — `LATERAL TABLE(f(x)) AS t(c)` lowers onto `LATERAL
  * VIEW explode(f(x)) t AS c` (one column) or `... inline(f(x)) t AS
  * a, b` (several), and Flink's `LEFT JOIN ... ON TRUE` keep-empty form
  * onto `LATERAL VIEW OUTER` (see
  * [[graft.plans.TemporalFunctions.rewrite]]) — Spark's native
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

  /** A row-POJO's struct fields: the class's OWN public non-static
    * fields in declaration order (getDeclaredFields preserves it on
    * every shipping JVM; the declared contract is "fields in source
    * order", like Flink's Row arity).
    */
  private[functions] def pojoFields(cls: Class[_]): Seq[java.lang.reflect.Field] =
    cls.getDeclaredFields.toSeq.filter(f =>
      Modifier.isPublic(f.getModifiers) && !Modifier.isStatic(f.getModifiers))

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
    // byte[] is the SCALAR binary return (ReflectiveScalar's BinaryType),
    // not an emission of TINYINT rows — leave it to the scalar bridge
    val isIterableRet = classOf[java.lang.Iterable[_]].isAssignableFrom(rt) ||
      classOf[java.util.Iterator[_]].isAssignableFrom(rt) ||
      (rt.isArray && rt != classOf[Array[Byte]])
    if (!isVoid && !isIterableRet) return false // scalar-shaped
    if (!Modifier.isStatic(m.getModifiers))
      try cls.getDeclaredConstructor()
      catch {
        case _: NoSuchMethodException =>
          fail(s"CREATE FUNCTION $name AS '$impl': the class needs a public " +
            "no-arg constructor (Flink's TableFunction contract)")
      }
    val field = collectorField(cls)
    // a void eval whose FIRST parameter is a CompletableFuture is the
    // FLIP-400 AsyncScalarFunction shape, not a collector-less UDTF —
    // route to the scalar bridge's async-eval bridge
    if (isVoid && field.isEmpty && m.getParameterTypes.headOption.exists(
        classOf[java.util.concurrent.CompletableFuture[_]].isAssignableFrom))
      return false
    if (isVoid && field.isEmpty)
      fail(s"CREATE FUNCTION $name AS '$impl': a void eval emits through a " +
        "public java.util.function.Consumer field named 'collector' — port " +
        "Flink's TableFunction by declaring the field and rewriting " +
        "collect(x) to collector.accept(x) (or return an Iterable/array)")
    // a STATIC collect-style eval has no instance to hold the (instance)
    // collector field — it would NPE at task time; fail at registration
    if (isVoid && Modifier.isStatic(m.getModifiers))
      fail(s"CREATE FUNCTION $name AS '$impl': a collect-style (void) eval " +
        "must be an instance method — the 'collector' field lives on the " +
        "instance (make eval non-static, or return an Iterable/array)")
    val elemClass: Class[_] =
      (if (rt.isArray) Some(rt.getComponentType)
       else if (isVoid) genericArg(field.get.getGenericType)
       else genericArg(m.getGenericReturnType))
        .getOrElse(fail(s"CREATE FUNCTION $name AS '$impl': cannot read the " +
          "emitted row type — use a typed array return, or a generic " +
          s"Iterable<T>/Consumer<T> signature (raw types erase T)"))
    // row type: a supported scalar (one output column, explode path) or
    // a POJO whose public fields are all supported scalars (multi-column
    // struct rows, inline path) — Flink's Row-typed TableFunction ported
    // as a plain result class
    val elemType = ReflectiveScalar.typeTable.get(elemClass).getOrElse {
      val fs = ReflectiveTable.pojoFields(elemClass)
      if (fs.isEmpty)
        fail(s"CREATE FUNCTION $name AS '$impl': emitted rows of type " +
          s"${elemClass.getName} are unsupported — a SCALAR (primitives/" +
          "boxes, String, byte[], BigDecimal, Timestamp, Date) for one " +
          "output column, or a result class whose PUBLIC fields are all " +
          "supported scalars for multi-column rows")
      StructType(fs.map { f =>
        StructField(f.getName, ReflectiveScalar.typeTable.getOrElse(f.getType,
          fail(s"CREATE FUNCTION $name AS '$impl': row field " +
            s"'${f.getName}' has unsupported type ${f.getType.getName}")))
      })
    }
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
    FunctionParams.record(spark, name, m.getParameters.toSeq)
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
  // (instance, eval, emission buffer, struct fields when rows are POJOs)
  @transient private lazy val local =
    new ThreadLocal[(AnyRef, Method, scala.collection.mutable.ArrayBuffer[AnyRef],
        Option[Array[java.lang.reflect.Field]])] {
      override def initialValue() = {
        val cls = org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
        val m = ReflectiveScalar.publicEvals(cls).head
        val inst =
          if (Modifier.isStatic(m.getModifiers)) null
          else cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
        val buf = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
        val rt = m.getReturnType
        val elemClass: Option[Class[_]] =
          if (rt.isArray) Some(rt.getComponentType)
          else if (rt == java.lang.Void.TYPE) {
            val f = cls.getFields.find(f => f.getName == "collector" &&
              classOf[java.util.function.Consumer[_]].isAssignableFrom(f.getType)).get
            f.set(inst, new java.util.function.Consumer[AnyRef] {
              override def accept(x: AnyRef): Unit = { buf += x; () }
            })
            f.getGenericType match {
              case p: java.lang.reflect.ParameterizedType =>
                p.getActualTypeArguments.headOption.collect { case c: Class[_] => c }
              case _ => None
            }
          } else m.getGenericReturnType match {
            case p: java.lang.reflect.ParameterizedType =>
              p.getActualTypeArguments.headOption.collect { case c: Class[_] => c }
            case _ => None
          }
        val rowFields = elemClass
          .filterNot(ReflectiveScalar.typeTable.contains)
          .map(c => ReflectiveTable.pojoFields(c).toArray)
          .filter(_.nonEmpty)
        (inst, m, buf, rowFields)
      }
    }

  def apply(args: Array[AnyRef]): AnyRef = {
    val (inst, m, buf, rowFields) = local.get()
    val params = m.getParameterTypes
    val coerced = new Array[AnyRef](args.length)
    var i = 0
    while (i < args.length) { coerced(i) = EvalCoercion.coerce(params(i), args(i)); i += 1 }
    val raw: Seq[AnyRef] =
      if (m.getReturnType == java.lang.Void.TYPE) {
        buf.clear()
        m.invoke(inst, coerced: _*)
        buf.toSeq
      } else m.invoke(inst, coerced: _*) match {
        case null => return null
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
    rowFields match {
      case None => raw
      case Some(fs) => raw.map { x =>
        if (x == null) null
        else org.apache.spark.sql.Row.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(fs.map(_.get(x))))
      }
    }
  }

  private def fail(msg: String): Nothing = throw new IllegalStateException(msg)
}
