package graft.functions

import java.lang.reflect.{Method, Modifier, ParameterizedType, Type}

import org.apache.spark.sql.{SparkSession, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Reflective TABLE-AGGREGATE-function bridge for `CREATE FUNCTION name
  * AS 'class'` — the fourth and last CREATE FUNCTION kind, Flink's
  * `TableAggregateFunction` ([U] flink-table-common
  * `functions/TableAggregateFunction.java`), duck-typed like the other
  * three bridges (flink-table is not on this classpath, so the contract
  * is the method shape):
  *
  *  - `public A createAccumulator()`;
  *  - exactly one `public void accumulate(A acc, x1 [, x2 [, x3]])`
  *    mutating the accumulator in place;
  *  - `public void merge(A acc, java.lang.Iterable<A> others)` —
  *    REQUIRED (partial aggregates combine across partitions here);
  *  - `public void emitValue(A acc, java.util.function.Consumer<T>
  *    out)` — the port of Flink's `emitValue(acc, Collector<T>)`
  *    (rewrite `out.collect(x)` to `out.accept(x)`, the same Collector
  *    → Consumer convention as the table bridge). `T` is a supported
  *    scalar (one output column) or a result POJO whose public fields
  *    are supported scalars (multi-column rows).
  *
  * Lowering: a Catalyst [[TypedImperativeAggregate]] whose buffer is
  * the user's LIVE accumulator (kryo only at partial boundaries — the
  * same cost profile as the AggregateFunction bridge) and whose value
  * is `ARRAY<T>` / `ARRAY<STRUCT<...>>` of the emitValue rows. SQL has
  * no flatAggregate (in Flink a TableAggregateFunction is Table-API
  * only), so the declared invocation is the aggregate call plus the
  * same generator lowering as the UDTF bridge:
  * {{{
  *   SELECT key, T.c1, T.c2
  *   FROM (SELECT key, top2(id, v) AS rows FROM t GROUP BY key) g
  *   LATERAL VIEW inline(rows) T AS c1, c2
  * }}}
  * (`explode` for single-column rows). `emitUpdateWithRetract` stays
  * the typed [[graft.operators.TableAgg]] route's domain — the
  * streaming runner diffs emitValue sets there.
  */
object ReflectiveTableAggregate {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def pub(m: Method): Boolean =
    Modifier.isPublic(m.getModifiers) && !m.isBridge && !m.isSynthetic

  private def genericArg1(t: Type): Option[Class[_]] = t match {
    case p: ParameterizedType => p.getActualTypeArguments.headOption.collect {
      case c: Class[_] => c
    }
    case _ => None
  }

  /** The duck shape: (createAccumulator, accumulate, merge, emitValue).
    * `emitValue(acc, Consumer)` is what distinguishes a table aggregate
    * from the AggregateFunction bridge's `getValue(acc)`.
    */
  private[functions] def shape(cls: Class[_]):
      Option[(Method, Method, Option[Method], Method)] = {
    val create = cls.getMethods.find(m => m.getName == "createAccumulator" &&
      m.getParameterCount == 0 && pub(m) && m.getReturnType != java.lang.Void.TYPE)
    create.flatMap { c =>
      val accCls = c.getReturnType
      val emit = cls.getMethods.find(m => m.getName == "emitValue" && pub(m) &&
        m.getParameterCount == 2 && m.getParameterTypes.head.isAssignableFrom(accCls) &&
        classOf[java.util.function.Consumer[_]].isAssignableFrom(m.getParameterTypes()(1)))
      val accs = cls.getMethods.filter(m => m.getName == "accumulate" && pub(m) &&
        m.getParameterCount >= 2 && m.getParameterTypes.head.isAssignableFrom(accCls))
      val merge = cls.getMethods.find(m => m.getName == "merge" && pub(m) &&
        m.getParameterCount == 2 && m.getParameterTypes.head.isAssignableFrom(accCls) &&
        classOf[java.lang.Iterable[_]].isAssignableFrom(m.getParameterTypes()(1)))
      (emit, accs.headOption) match {
        case (Some(e), Some(a)) => Some((c, a, merge, e))
        case _ => None
      }
    }
  }

  /** Register `name` over `impl`'s TableAggregateFunction shape if the
    * class resolves and HAS the shape (createAccumulator + accumulate +
    * emitValue(acc, Consumer)). Returns false otherwise (the other
    * bridges' domain); fails typed when the shape is present but
    * outside the subset.
    */
  def register(spark: SparkSession, name: String, impl: String): Boolean = {
    val cls =
      try GraftColumnBridge.loadSessionClass(spark, impl)
      catch {
        case _: ClassNotFoundException | _: NoClassDefFoundError => return false
      }
    val (create, acc, mergeOpt, emit) = shape(cls).getOrElse(return false)
    val accsAll = cls.getMethods.filter(m => m.getName == "accumulate" && pub(m))
    if (accsAll.length > 1)
      fail(s"CREATE FUNCTION $name AS '$impl': the table-aggregate bridge " +
        s"supports exactly one public accumulate; '$impl' overloads it " +
        s"${accsAll.length} ways")
    try cls.getDeclaredConstructor()
    catch {
      case _: NoSuchMethodException =>
        fail(s"CREATE FUNCTION $name AS '$impl': the class needs a public " +
          "no-arg constructor (Flink's TableAggregateFunction contract)")
    }
    if (mergeOpt.isEmpty)
      fail(s"CREATE FUNCTION $name AS '$impl': distributed table aggregation " +
        "needs Flink's merge(acc, Iterable<acc>) — partial accumulators " +
        "combine across partitions there")
    val args = acc.getParameterTypes.drop(1)
    if (args.length > 3)
      fail(s"CREATE FUNCTION $name AS '$impl': accumulate takes ${args.length} " +
        "value arguments; the bridge's maximum is 3")
    val inTypes = args.zipWithIndex.map { case (p, i) =>
      ReflectiveScalar.typeTable.getOrElse(p,
        fail(s"CREATE FUNCTION $name AS '$impl': accumulate argument ${i + 1} " +
          s"has unsupported type ${p.getName}"))
    }.toSeq
    // the emitted row type: Consumer<T>'s T — scalar or result POJO
    val elemClass = genericArg1(emit.getGenericParameterTypes()(1)).getOrElse(
      fail(s"CREATE FUNCTION $name AS '$impl': cannot read the emitted row " +
        "type — declare emitValue(acc, java.util.function.Consumer<T>) with " +
        "a concrete T (raw types erase it)"))
    val elemType = ReflectiveScalar.typeTable.get(elemClass).getOrElse {
      val fs = ReflectiveTable.pojoFields(elemClass)
      if (fs.isEmpty)
        fail(s"CREATE FUNCTION $name AS '$impl': emitted rows of type " +
          s"${elemClass.getName} are unsupported — a SCALAR for one output " +
          "column, or a result class whose PUBLIC fields are all supported " +
          "scalars for multi-column rows")
      StructType(fs.map { f =>
        StructField(f.getName, ReflectiveScalar.typeTable.getOrElse(f.getType,
          fail(s"CREATE FUNCTION $name AS '$impl': row field '${f.getName}' " +
            s"has unsupported type ${f.getType.getName}")))
      })
    }
    GraftColumnBridge.registerFunction(spark, name, exprs => {
      if (exprs.length != args.length)
        fail(s"$name takes ${args.length} argument(s), got ${exprs.length}")
      TableAggExpr(impl, inTypes, elemType, exprs)
    })
    true
  }
}

/** The Catalyst face of a reflective TableAggregateFunction: the buffer
  * is the user's live accumulator object (kryo at partial boundaries
  * only, deserialized against the session-jar classloader), update
  * mutates it via `accumulate`, merge via `merge(acc, Iterable)`, and
  * eval drains `emitValue` into an ARRAY of rows.
  */
private[functions] case class TableAggExpr(className: String,
    inTypes: Seq[DataType], elemType: DataType, children: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AnyRef] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elemType)
  override def prettyName: String = "reflective_table_agg"

  @transient private lazy val bound:
      (AnyRef, Method, Method, Method, Method, Array[Class[_]]) = {
    val cls = GraftColumnBridge.loadTaskClass(className)
    val (c, a, m, e) = ReflectiveTableAggregate.shape(cls).get
    val inst = cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    (inst, c, a, m.get, e, a.getParameterTypes.drop(1))
  }
  @transient private lazy val toScala =
    children.map(c => CatalystTypeConverters.createToScalaConverter(c.dataType)).toArray
  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(dataType)
  @transient private lazy val pojoFs: Seq[java.lang.reflect.Field] = elemType match {
    case _: StructType =>
      val cls = GraftColumnBridge.loadTaskClass(className)
    val (_, _, _, e) = ReflectiveTableAggregate.shape(cls).get
      val elemCls = e.getGenericParameterTypes()(1)
        .asInstanceOf[ParameterizedType].getActualTypeArguments.head
        .asInstanceOf[Class[_]]
      ReflectiveTable.pojoFields(elemCls)
    case _ => Nil
  }
  @transient private lazy val kryo =
    new org.apache.spark.serializer.KryoSerializer(org.apache.spark.SparkEnv.get.conf)

  override def createAggregationBuffer(): AnyRef = {
    val (i, c, _, _, _, _) = bound
    c.invoke(i)
  }

  override def update(buffer: AnyRef, input: InternalRow): AnyRef = {
    val (i, _, a, _, _, ps) = bound
    val coerced = new Array[AnyRef](children.length + 1)
    coerced(0) = buffer
    var k = 0
    while (k < children.length) {
      val v = toScala(k)(children(k).eval(input)).asInstanceOf[AnyRef]
      coerced(k + 1) = EvalCoercion.coerce(ps(k), v)
      k += 1
    }
    a.invoke(i, coerced: _*)
    buffer
  }

  override def merge(buffer: AnyRef, input: AnyRef): AnyRef = {
    val (i, _, _, m, _, _) = bound
    m.invoke(i, buffer, java.util.Collections.singletonList(input))
    buffer
  }

  override def eval(buffer: AnyRef): Any = {
    val (i, _, _, _, e, _) = bound
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sink: java.util.function.Consumer[AnyRef] =
      new java.util.function.Consumer[AnyRef] {
        override def accept(t: AnyRef): Unit = {
          out += (elemType match {
            case _: StructType =>
              org.apache.spark.sql.Row.fromSeq(pojoFs.map(_.get(t)))
            case _ => t
          })
        }
      }
    e.invoke(i, buffer, sink)
    toCatalyst(out.toSeq)
  }

  override def serialize(buffer: AnyRef): Array[Byte] = {
    val bb = kryo.newInstance().serialize(buffer)(scala.reflect.ClassTag.AnyRef)
    java.util.Arrays.copyOfRange(bb.array(), bb.position(), bb.limit())
  }

  override def deserialize(bytes: Array[Byte]): AnyRef =
    // resolve against the SAME loader `bound` loaded the user class with
    // — a second loader would make merge()'s internal casts fail even
    // though the class NAMES match
    kryo.newInstance().deserialize[AnyRef](java.nio.ByteBuffer.wrap(bytes),
      bound._1.getClass.getClassLoader)(scala.reflect.ClassTag.AnyRef)

  override def withNewMutableAggBufferOffset(newOffset: Int): TableAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TableAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TableAggExpr =
    copy(children = newChildren)
}
