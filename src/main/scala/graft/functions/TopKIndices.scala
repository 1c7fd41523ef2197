package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Indices of the k largest elements of an array<double>, descending —
  * one expression, one evaluation of the (possibly expensive) child.
  *
  * Exists because composing argmax chains from builtins
  * (array_max/array_position/array_remove nested per rank) re-inlines the
  * child expression 3^k times through CollapseProject: with a child like
  * "distances to 32 centroids" that measured as a codegen bailout (method
  * too large → whole plan interpreted) and a 7× slowdown. A dedicated
  * kernel keeps the child referenced once and the plan codegen'd.
  */
case class TopKIndices(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TopKIndicesKernel.topk(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopKIndicesKernel.topk($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopKIndicesKernel {
  /** O(n·k) selection — n and k are both small (centroid counts). */
  def topk(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val kk = math.min(k, n)
    val picked = new Array[Int](kk)
    val used = new Array[Boolean](n)
    var r = 0
    while (r < kk) {
      var best = -1
      var bestV = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val v = arr.getDouble(i)
          if (v > bestV) { bestV = v; best = i }
        }
        i += 1
      }
      used(best) = true
      picked(r) = best
      r += 1
    }
    new GenericArrayData(picked)
  }
}

object TopKIndices {
  def apply(arr: Column, k: Int): Column =
    GraftColumnBridge.column(TopKIndices(GraftColumnBridge.expression(arr), k))
}
