package graft.functions

import java.lang.reflect.{Method, Modifier}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java._
import org.apache.spark.sql.types._

/** Reflective `eval` bridge for the dialect's `CREATE FUNCTION name AS
  * 'class'` when the class IS resolvable on the session classpath
  * (ADD JAR / test classpath) — the Flink `ScalarFunction` calling
  * convention ([U] flink-table-common `functions/ScalarFunction`): a
  * no-arg-constructible class exposing one public `eval` method invoked
  * per row. flink-table itself is not on this classpath, so the contract
  * is duck-typed on the `eval` shape rather than on the base class —
  * which also admits plain POJO UDFs.
  *
  * Declared subset (typed errors outside it): exactly one public `eval`
  * (Flink's overload resolution needs its type inference stack), arity
  * ≤ 6, parameter/return types drawn from the JDBC-ish primitive set
  * (numeric/boolean primitives and boxes, String, byte[], BigDecimal,
  * java.sql.Timestamp/Date). Arguments are coerced with Java widening
  * before `Method.invoke`; the instance is created lazily PER JVM (the
  * class name travels, not the instance, so the UDF serializes whether
  * or not the user class does).
  */
object ReflectiveScalar {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def sparkTypeOf(c: Class[_]): Option[DataType] = typeTable.get(c)

  private[functions] val typeTable: Map[Class[_], DataType] = Map(
    java.lang.Boolean.TYPE -> BooleanType, classOf[java.lang.Boolean] -> BooleanType,
    java.lang.Byte.TYPE -> ByteType, classOf[java.lang.Byte] -> ByteType,
    java.lang.Short.TYPE -> ShortType, classOf[java.lang.Short] -> ShortType,
    java.lang.Integer.TYPE -> IntegerType, classOf[java.lang.Integer] -> IntegerType,
    java.lang.Long.TYPE -> LongType, classOf[java.lang.Long] -> LongType,
    java.lang.Float.TYPE -> FloatType, classOf[java.lang.Float] -> FloatType,
    java.lang.Double.TYPE -> DoubleType, classOf[java.lang.Double] -> DoubleType,
    classOf[String] -> StringType,
    classOf[Array[Byte]] -> BinaryType,
    classOf[java.math.BigDecimal] -> DataTypes.createDecimalType(38, 18),
    classOf[java.sql.Timestamp] -> TimestampType,
    classOf[java.sql.Date] -> DateType)

  private[functions] def publicEvals(cls: Class[_]): Array[Method] =
    cls.getMethods.filter(m => m.getName == "eval" &&
      Modifier.isPublic(m.getModifiers) && !m.isBridge && !m.isSynthetic)

  /** Register `name` over `impl`'s `eval` if the class resolves and has
    * the ScalarFunction shape. Returns false when the class does not
    * resolve or has no public `eval` (the caller raises its porting
    * error); fails typed when it IS the shape but outside the subset.
    */
  def register(spark: SparkSession, name: String, impl: String): Boolean = {
    val cls =
      try org.apache.spark.sql.GraftColumnBridge.loadSessionClass(spark, impl)
      catch {
        case _: ClassNotFoundException | _: NoClassDefFoundError => return false
      }
    val evals = publicEvals(cls)
    if (evals.isEmpty) return false
    if (evals.length > 1)
      fail(s"CREATE FUNCTION $name AS '$impl': the eval bridge supports exactly " +
        s"one public eval method; '$impl' overloads it ${evals.length} ways — " +
        "split the overloads into one registered function each")
    val m = evals.head
    // FLIP-400 AsyncScalarFunction shape ([U] flink-table-common
    // functions/AsyncScalarFunction.java: `void eval(CompletableFuture<T>
    // result, args...)`) — BRIDGED: the call invokes eval with a fresh
    // future per row and awaits it (Flink's async-scalar default timeout,
    // 3 min). Value semantics are identical to Flink's ORDERED output
    // mode; the in-flight OVERLAP knob (buffer-capacity) has no slot in
    // Spark's codegen'd row pipeline — for overlap, the typed
    // graft.operators.AsyncIO route carries capacity + ordered/unordered.
    val cf = classOf[java.util.concurrent.CompletableFuture[_]]
    if (cf.isAssignableFrom(m.getReturnType))
      fail(s"CREATE FUNCTION $name AS '$impl': eval RETURNS a " +
        "CompletableFuture — not the FLIP-400 AsyncScalarFunction shape, " +
        "which takes the future as the FIRST PARAMETER: " +
        "`void eval(CompletableFuture<T> result, args...)`; declare that " +
        "shape (bridged, awaited per row), or use graft.operators.AsyncIO " +
        "on the typed API for overlapped calls")
    if (m.getParameterTypes.headOption.exists(cf.isAssignableFrom))
      return registerAsync(spark, name, impl, cls, m)
    if (!Modifier.isStatic(m.getModifiers))
      try cls.getDeclaredConstructor()
      catch {
        case _: NoSuchMethodException =>
          fail(s"CREATE FUNCTION $name AS '$impl': the class needs a public " +
            "no-arg constructor (Flink's ScalarFunction contract)")
      }
    val ret = sparkTypeOf(m.getReturnType).getOrElse(
      fail(s"CREATE FUNCTION $name AS '$impl': eval returns " +
        s"${m.getReturnType.getName}; supported returns are primitives/boxes, " +
        "String, byte[], BigDecimal, Timestamp, Date"))
    m.getParameterTypes.zipWithIndex.foreach { case (p, i) =>
      if (sparkTypeOf(p).isEmpty)
        fail(s"CREATE FUNCTION $name AS '$impl': eval parameter ${i + 1} has " +
          s"unsupported type ${p.getName}")
    }
    registerUdf(spark, name, impl, m.getParameterCount, ret, new EvalBridge(impl))
    FunctionParams.record(spark, name, m.getParameters.toSeq)
    true
  }

  /** The FLIP-400 async-eval bridge: `void eval(CompletableFuture<T>
    * result, args...)` registers as an N−1-ary scalar function whose
    * call hands eval a fresh future and awaits it. The result type is
    * read off the future's declared type argument — a raw
    * `CompletableFuture` has no result type to map and fails typed.
    */
  private def registerAsync(spark: SparkSession, name: String, impl: String,
      cls: Class[_], m: Method): Boolean = {
    if (m.getReturnType != java.lang.Void.TYPE)
      fail(s"CREATE FUNCTION $name AS '$impl': an async eval (FLIP-400) " +
        s"must return void — the result travels through the future " +
        s"parameter; saw return type ${m.getReturnType.getName}")
    val resultCls = m.getGenericParameterTypes.head match {
      case p: java.lang.reflect.ParameterizedType =>
        p.getActualTypeArguments.head match {
          case c: Class[_] => c
          case t => fail(s"CREATE FUNCTION $name AS '$impl': the future's " +
            s"result type must be a concrete class, saw $t")
        }
      case _ => fail(s"CREATE FUNCTION $name AS '$impl': declare the " +
        "future's result type — a raw CompletableFuture has no SQL " +
        "return type to map (use CompletableFuture<String>, " +
        "CompletableFuture<Long>, ...)")
    }
    val ret = sparkTypeOf(resultCls).getOrElse(
      fail(s"CREATE FUNCTION $name AS '$impl': the future completes with " +
        s"${resultCls.getName}; supported results are primitives/boxes, " +
        "String, byte[], BigDecimal, Timestamp, Date"))
    m.getParameterTypes.drop(1).zipWithIndex.foreach { case (p, i) =>
      if (sparkTypeOf(p).isEmpty)
        fail(s"CREATE FUNCTION $name AS '$impl': eval parameter ${i + 2} has " +
          s"unsupported type ${p.getName}")
    }
    if (!Modifier.isStatic(m.getModifiers))
      try cls.getDeclaredConstructor()
      catch {
        case _: NoSuchMethodException =>
          fail(s"CREATE FUNCTION $name AS '$impl': the class needs a public " +
            "no-arg constructor (Flink's AsyncScalarFunction contract)")
      }
    registerUdf(spark, name, impl, m.getParameterCount - 1, ret,
      new AsyncEvalBridge(impl))
    // the future slot is not SQL-invocable — names cover the rest
    FunctionParams.record(spark, name, m.getParameters.drop(1).toSeq)
    true
  }

  private def registerUdf(spark: SparkSession, name: String, impl: String,
      arity: Int, ret: DataType, b: Array[AnyRef] => AnyRef): Unit =
    arity match {
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
}

/** Serializable per-JVM lazy holder: ships the class NAME, resolves the
  * class/method/instance on first use on whatever JVM invokes it.
  */
private final class EvalBridge(className: String)
    extends (Array[AnyRef] => AnyRef) with Serializable {
  @transient private lazy val bound: (AnyRef, Method) = {
    val cls = org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
    val m = ReflectiveScalar.publicEvals(cls).head
    val inst =
      if (Modifier.isStatic(m.getModifiers)) null
      else cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    (inst, m)
  }

  def apply(args: Array[AnyRef]): AnyRef = {
    val (inst, m) = bound
    val params = m.getParameterTypes
    val coerced = new Array[AnyRef](args.length)
    var i = 0
    while (i < args.length) { coerced(i) = EvalCoercion.coerce(params(i), args(i)); i += 1 }
    m.invoke(inst, coerced: _*)
  }
}

/** FLIP-400 async-eval holder: hands eval a fresh future per row and
  * awaits it — Flink's `table.exec.async-scalar.timeout` default
  * (3 min). Per-row await is the ORDERED output mode's value semantics;
  * eval may complete the future on any thread (or synchronously).
  */
private final class AsyncEvalBridge(className: String)
    extends (Array[AnyRef] => AnyRef) with Serializable {
  @transient private lazy val bound: (AnyRef, Method) = {
    val cls = org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
    val m = ReflectiveScalar.publicEvals(cls).head
    val inst =
      if (Modifier.isStatic(m.getModifiers)) null
      else cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    (inst, m)
  }

  def apply(args: Array[AnyRef]): AnyRef = {
    val (inst, m) = bound
    val params = m.getParameterTypes
    val coerced = new Array[AnyRef](args.length + 1)
    val future = new java.util.concurrent.CompletableFuture[AnyRef]()
    coerced(0) = future
    var i = 0
    while (i < args.length) {
      coerced(i + 1) = EvalCoercion.coerce(params(i + 1), args(i)); i += 1
    }
    // a SYNCHRONOUS throw inside eval must surface as the user code's
    // failure too — unwrap the reflection wrapper like the sync bridge
    try m.invoke(inst, coerced: _*)
    catch {
      case e: java.lang.reflect.InvocationTargetException =>
        throw Option(e.getCause).getOrElse(e)
    }
    try future.get(180000L, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      // surface the user code's failure, not the future plumbing
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
      case _: java.util.concurrent.TimeoutException =>
        // cancel the in-flight call so the abandoned future can't leak
        future.cancel(true)
        throw new java.util.concurrent.TimeoutException(
          s"async eval '$className' did not complete its future within " +
            "180000 ms (the Flink async-scalar default timeout)")
    }
  }
}

private[functions] object EvalCoercion {
  /** Java-widening coercion from the external value Spark hands a
    * java-UDF to the eval parameter's declared type (shared by the
    * scalar and table bridges).
    */
  def coerce(target: Class[_], v: AnyRef): AnyRef = v match {
    case null => null
    case n: java.lang.Number =>
      target match {
        case java.lang.Byte.TYPE => java.lang.Byte.valueOf(n.byteValue)
        case java.lang.Short.TYPE => java.lang.Short.valueOf(n.shortValue)
        case java.lang.Integer.TYPE => java.lang.Integer.valueOf(n.intValue)
        case java.lang.Long.TYPE => java.lang.Long.valueOf(n.longValue)
        case java.lang.Float.TYPE => java.lang.Float.valueOf(n.floatValue)
        case java.lang.Double.TYPE => java.lang.Double.valueOf(n.doubleValue)
        case t if t == classOf[java.lang.Byte] => java.lang.Byte.valueOf(n.byteValue)
        case t if t == classOf[java.lang.Short] => java.lang.Short.valueOf(n.shortValue)
        case t if t == classOf[java.lang.Integer] => java.lang.Integer.valueOf(n.intValue)
        case t if t == classOf[java.lang.Long] => java.lang.Long.valueOf(n.longValue)
        case t if t == classOf[java.lang.Float] => java.lang.Float.valueOf(n.floatValue)
        case t if t == classOf[java.lang.Double] => java.lang.Double.valueOf(n.doubleValue)
        case t if t == classOf[java.math.BigDecimal] =>
          new java.math.BigDecimal(n.toString)
        case _ => v
      }
    case d: java.math.BigDecimal if target == java.lang.Double.TYPE ||
        target == classOf[java.lang.Double] =>
      java.lang.Double.valueOf(d.doubleValue)
    case _ => v
  }
}
