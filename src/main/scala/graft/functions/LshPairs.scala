package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Per-row kernels for the LSH candidate join (r15, §2.4): emit a
  * colliding pair from its FIRST colliding table only, so the candidate
  * set is distinct by construction and no dedup shuffle is needed.
  */
object LshPairs {
  /** True iff no index j < upTo has a(j) == b(j) — i.e. the current
    * table is the pair's first collision. A tight int loop: the
    * equivalent `exists(zip_with(slice(a), slice(b), …))` chain
    * allocates three arrays per evaluation, measured 5× slower across
    * an 8M-row candidate join.
    */
  def noEarlierCollision(a: ArrayData, b: ArrayData, upTo: Int): Boolean = {
    var j = 0
    while (j < upTo) {
      if (a.getInt(j) == b.getInt(j)) return false
      j += 1
    }
    true
  }
}

/** Boolean expression form of [[LshPairs.noEarlierCollision]] over two
  * array<int> bucket columns and the current table index.
  */
case class NoEarlierCollisionExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(a: Any, b: Any, t: Any): Any =
    LshPairs.noEarlierCollision(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) =>
      s"${ev.value} = graft.functions.LshPairs.noEarlierCollision($a, $b, $t);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NoEarlierCollisionExpr {
  def apply(a: Column, b: Column, table: Column): Column =
    GraftColumnBridge.column(NoEarlierCollisionExpr(
      GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(table)))
}
