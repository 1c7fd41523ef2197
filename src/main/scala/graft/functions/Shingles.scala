package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-gram word shingles in one kernel pass per document —
  * replaces both earlier formulations: the higher-order-function array
  * build (interpreted, ~1.4 ms/doc) and the posexplode + per-doc window
  * `lead` assembly (codegen'd but pays a shuffle + partition sort per
  * document before any shingle exists). Here the document row never
  * leaves its scan partition: whitespace tokenization, n-gram assembly,
  * and first-seen-order dedup run in one JVM loop, and downstream
  * operators explode the array directly.
  */
case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.shingles($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKernel {
  /** Space-joined n-grams of `\S+` tokens; `distinct` keeps the first
    * occurrence of each (set semantics for Jaccard / inverted index —
    * min-aggregates like MinHash are insensitive either way).
    */
  def shingles(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    // whitespace split matching the `\S+` token contract
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val raw = if (distinct) null else new java.util.ArrayList[String](m)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      if (distinct) seen.add(sb.toString) else raw.add(sb.toString)
      j += 1
    }
    val src: java.util.Collection[String] = if (distinct) seen else raw
    val out = new Array[Any](src.size)
    val it = src.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}

object WordShinglesExpr {
  def apply(text: Column, n: Int, distinct: Boolean = true): Column =
    GraftColumnBridge.column(
      WordShinglesExpr(GraftColumnBridge.expression(text), n, distinct))
}
