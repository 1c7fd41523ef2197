package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** One step of Spark's seeded xxhash64 chain, factored out so a string
  * hashed against many integer seeds is hashed ONCE (r15, §1.2 per-row
  * work — the MinHash signature aggregate evaluated
  * `xxhash64(shingle, i)` for every i, re-hashing the shingle's bytes
  * numHashes times per row).
  *
  * Spark evaluates `xxhash64(s, lit(i))` as
  * `XXH64.hashInt(i, XXH64.hashUnsafeBytes(s, 42))` — children fold
  * left-to-right through the running hash — and `xxhash64(s)` IS the
  * inner term. So `SeededXxHashInt(xxhash64(s), i)` is bit-identical to
  * `xxhash64(s, lit(i))` while paying the byte hash once
  * (MinHashSpec pins the identity).
  */
case class SeededXxHashInt(child: Expression, i: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(seed: Any): Any =
    XXH64.hashInt(i, seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($i, $c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeededXxHashInt {
  /** Column form (via the classic-converter bridge). */
  def apply(seed: Column, i: Int): Column =
    GraftColumnBridge.column(
      SeededXxHashInt(GraftColumnBridge.expression(seed), i))
}
