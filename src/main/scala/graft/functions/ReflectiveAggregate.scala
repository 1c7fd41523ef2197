package graft.functions

import java.lang.reflect.{Method, Modifier}

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, functions}
import org.apache.spark.sql.expressions.Aggregator

/** Reflective AGGREGATE-function bridge for `CREATE FUNCTION name AS
  * 'class'` — the Flink `AggregateFunction` calling convention ([U]
  * flink-table-common `functions/AggregateFunction.java`), duck-typed
  * like the scalar and table bridges (flink-table is not on this
  * classpath, so the contract is the method shape, which also admits
  * plain POJO aggregates):
  *
  *  - `public A createAccumulator()`;
  *  - exactly one `public void accumulate(A acc, x1 [, x2 [, x3]])` —
  *    1–3 value arguments from the scalar bridge's type set, mutating
  *    the accumulator in place (Flink's contract);
  *  - `public void merge(A acc, java.lang.Iterable<A> others)` —
  *    REQUIRED: partial aggregates combine across partitions here
  *    (map-side combine → final merge is exactly Flink's two-phase
  *    shape), an aggregate without merge cannot run distributed;
  *  - `public R getValue(A acc)` with `R` in the scalar type set.
  *
  * Lowering: a Spark typed [[Aggregator]] over the reflective binding —
  * a `TypedImperativeAggregate` at execution, so the accumulator stays
  * a LIVE object between rows and serializes (kryo) only at partial
  * boundaries, the same cost profile as Flink's heap accumulators.
  * Registered with `spark.udf.register`, so the name works in GROUP BY
  * aggregations, global aggregates, and windows alike. Null value
  * arguments reach boxed parameters as null and error on primitives —
  * filter nulls upstream (Flink's generated null-skipping is the
  * caller's responsibility here, documented delta).
  */
object ReflectiveAggregate {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def pub(m: Method): Boolean =
    Modifier.isPublic(m.getModifiers) && !m.isBridge && !m.isSynthetic

  private[functions] def shape(cls: Class[_]):
      Option[(Method, Method, Option[Method], Method)] = {
    val create = cls.getMethods.find(m => m.getName == "createAccumulator" &&
      m.getParameterCount == 0 && pub(m) && m.getReturnType != java.lang.Void.TYPE)
    create.flatMap { c =>
      val accCls = c.getReturnType
      val accs = cls.getMethods.filter(m => m.getName == "accumulate" && pub(m) &&
        m.getParameterCount >= 2 && m.getParameterTypes.head.isAssignableFrom(accCls))
      val getV = cls.getMethods.find(m => m.getName == "getValue" && pub(m) &&
        m.getParameterCount == 1 && m.getParameterTypes.head.isAssignableFrom(accCls))
      val merge = cls.getMethods.find(m => m.getName == "merge" && pub(m) &&
        m.getParameterCount == 2 && m.getParameterTypes.head.isAssignableFrom(accCls) &&
        classOf[java.lang.Iterable[_]].isAssignableFrom(m.getParameterTypes()(1)))
      (accs.toSeq, getV) match {
        case (Seq(a), Some(g)) => Some((c, a, merge, g))
        case (as, Some(g)) if as.length > 1 => Some((c, as.head, merge, g)) // checked below
        case _ => None
      }
    }
  }

  private def encoderOf(c: Class[_]): Option[Encoder[_]] = {
    import java.lang.{Boolean => JB, Byte => JBy, Short => JS, Integer => JI,
      Long => JL, Float => JF, Double => JD}
    val m: Map[Class[_], Encoder[_]] = Map(
      JB.TYPE -> Encoders.BOOLEAN, classOf[JB] -> Encoders.BOOLEAN,
      JBy.TYPE -> Encoders.BYTE, classOf[JBy] -> Encoders.BYTE,
      JS.TYPE -> Encoders.SHORT, classOf[JS] -> Encoders.SHORT,
      JI.TYPE -> Encoders.INT, classOf[JI] -> Encoders.INT,
      JL.TYPE -> Encoders.LONG, classOf[JL] -> Encoders.LONG,
      JF.TYPE -> Encoders.FLOAT, classOf[JF] -> Encoders.FLOAT,
      JD.TYPE -> Encoders.DOUBLE, classOf[JD] -> Encoders.DOUBLE,
      classOf[String] -> Encoders.STRING,
      classOf[Array[Byte]] -> Encoders.BINARY,
      classOf[java.math.BigDecimal] -> Encoders.DECIMAL,
      classOf[java.sql.Timestamp] -> Encoders.TIMESTAMP,
      classOf[java.sql.Date] -> Encoders.DATE)
    m.get(c)
  }

  /** Register `name` over `impl`'s AggregateFunction shape if the class
    * resolves and HAS the shape (createAccumulator + accumulate +
    * getValue). Returns false otherwise (the other bridges' domain);
    * fails typed when the shape is present but outside the subset.
    */
  def register(spark: SparkSession, name: String, impl: String): Boolean = {
    val cls =
      try org.apache.spark.sql.GraftColumnBridge.loadSessionClass(spark, impl)
      catch {
        case _: ClassNotFoundException | _: NoClassDefFoundError => return false
      }
    val (create, acc, mergeOpt, getV) = shape(cls).getOrElse(return false)
    val accsAll = cls.getMethods.filter(m => m.getName == "accumulate" && pub(m))
    if (accsAll.length > 1)
      fail(s"CREATE FUNCTION $name AS '$impl': the aggregate bridge supports " +
        s"exactly one public accumulate; '$impl' overloads it ${accsAll.length} ways")
    try cls.getDeclaredConstructor()
    catch {
      case _: NoSuchMethodException =>
        fail(s"CREATE FUNCTION $name AS '$impl': the class needs a public " +
          "no-arg constructor (Flink's AggregateFunction contract)")
    }
    if (mergeOpt.isEmpty)
      fail(s"CREATE FUNCTION $name AS '$impl': distributed aggregation needs " +
        "Flink's merge(acc, Iterable<acc>) — partial aggregates combine " +
        "across partitions there; an aggregate without merge cannot run " +
        "two-phase")
    val args = acc.getParameterTypes.drop(1)
    if (args.length > 3)
      fail(s"CREATE FUNCTION $name AS '$impl': accumulate takes ${args.length} " +
        "value arguments; the bridge's maximum is 3")
    args.zipWithIndex.foreach { case (p, i) =>
      if (encoderOf(p).isEmpty)
        fail(s"CREATE FUNCTION $name AS '$impl': accumulate argument ${i + 1} " +
          s"has unsupported type ${p.getName}")
    }
    val outEnc = encoderOf(getV.getReturnType).getOrElse(
      fail(s"CREATE FUNCTION $name AS '$impl': getValue returns " +
        s"${getV.getReturnType.getName}; supported returns are primitives/" +
        "boxes, String, byte[], BigDecimal, Timestamp, Date"))
    val agg = new ReflectiveAgg(impl, args.length, outEnc.asInstanceOf[Encoder[Any]])
    val inEnc: Encoder[Any] = (args.map(a => encoderOf(a).get): Seq[Encoder[_]]) match {
      case Seq(e1) => e1.asInstanceOf[Encoder[Any]]
      case Seq(e1, e2) => Encoders.tuple(e1, e2).asInstanceOf[Encoder[Any]]
      case Seq(e1, e2, e3) => Encoders.tuple(e1, e2, e3).asInstanceOf[Encoder[Any]]
      case _ => fail("unreachable: arity checked above")
    }
    spark.udf.register(name, functions.udaf(agg, inEnc))
    true
  }
}

/** The typed-Aggregator face of a reflective AggregateFunction: the
  * buffer is the user's live accumulator object (kryo at partial
  * boundaries only), reduce mutates it via `accumulate`, merge via
  * Flink's `merge(acc, Iterable)` with a singleton list.
  */
private final class ReflectiveAgg(className: String, arity: Int,
    outEnc: Encoder[Any]) extends Aggregator[Any, AnyRef, Any] {

  @transient private lazy val bound:
      (AnyRef, Method, Method, Method, Method, Array[Class[_]]) = {
    val cls = org.apache.spark.sql.GraftColumnBridge.loadTaskClass(className)
    val (c, a, m, g) = ReflectiveAggregate.shape(cls).get
    val inst = cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    (inst, c, a, m.get, g, a.getParameterTypes.drop(1))
  }

  override def zero: AnyRef = { val (i, c, _, _, _, _) = bound; c.invoke(i) }

  override def reduce(acc: AnyRef, x: Any): AnyRef = {
    val (i, _, a, _, _, ps) = bound
    val raw: Array[AnyRef] = (arity, x) match {
      case (1, v) => Array(v.asInstanceOf[AnyRef])
      case (2, t: (_, _)) => Array(t._1.asInstanceOf[AnyRef], t._2.asInstanceOf[AnyRef])
      case (3, t: (_, _, _)) => Array(t._1.asInstanceOf[AnyRef],
        t._2.asInstanceOf[AnyRef], t._3.asInstanceOf[AnyRef])
      case _ => throw new IllegalStateException(s"arity $arity vs input $x")
    }
    val coerced = new Array[AnyRef](raw.length + 1)
    coerced(0) = acc
    var k = 0
    while (k < raw.length) { coerced(k + 1) = EvalCoercion.coerce(ps(k), raw(k)); k += 1 }
    a.invoke(i, coerced: _*)
    acc
  }

  override def merge(b1: AnyRef, b2: AnyRef): AnyRef = {
    val (i, _, _, m, _, _) = bound
    m.invoke(i, b1, java.util.Collections.singletonList(b2))
    b1
  }

  override def finish(acc: AnyRef): Any = {
    val (i, _, _, _, g, _) = bound
    g.invoke(i, acc)
  }

  override def bufferEncoder: Encoder[AnyRef] = Encoders.kryo[AnyRef]
  override def outputEncoder: Encoder[Any] = outEnc
}
