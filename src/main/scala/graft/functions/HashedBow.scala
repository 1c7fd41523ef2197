package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

object HashedBowKernel {
  /** FNV-1a over the token's UTF-8 bytes — pinned in-repo so feature
    * hashing never drifts with a Spark upgrade (UTF8String.hashCode is
    * an implementation detail; this is not).
    */
  def fnv1a(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
    h
  }

  /** Feature vector of the tokens hashed into `dim` buckets (the
    * hashing trick — fixed dimensionality regardless of vocabulary, so
    * the downstream model never needs a corpus-wide dictionary build).
    * `binary=false`: term frequencies normalized by token count;
    * `binary=true`: bucket presence 0/1 (the stronger-margin encoding a
    * linear quality model trains fastest on). Empty docs map to the
    * zero vector.
    */
  def bow(tokens: ArrayData, dim: Int, binary: Boolean): ArrayData = {
    val v = new Array[Double](dim)
    val n = tokens.numElements()
    if (n > 0) {
      var i = 0
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          val b = tokens.getUTF8String(i).getBytes
          val k = Math.floorMod(fnv1a(b), dim)
          if (binary) v(k) = 1.0 else v(k) += 1.0
        }
        i += 1
      }
      if (!binary) {
        val inv = 1.0 / n
        i = 0
        while (i < dim) { v(i) *= inv; i += 1 }
      }
    }
    new GenericArrayData(v)
  }
}

/** `array<string>` tokens → hashed bag-of-words `array<double>` of length
  * `dim` (SURVEY.md north_star text analysis; the featurizer of the
  * quality-classifier pipeline in
  * [[graft.operators.QualityClassifier]]). Codegen'd per-row kernel —
  * one narrow scan, no shuffle, no dictionary: the 100 TB featurization
  * shape.
  */
case class HashedBow(child: Expression, dim: Int, binary: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashedBowKernel.bow(input.asInstanceOf[ArrayData], dim, binary)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedBowKernel.bow($c, $dim, $binary);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBow {
  def apply(tokens: Column, dim: Int): Column = apply(tokens, dim, binary = false)

  def apply(tokens: Column, dim: Int, binary: Boolean): Column =
    GraftColumnBridge.column(
      HashedBow(GraftColumnBridge.expression(tokens), dim, binary))
}
