package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing kernel (Schleimer et al., SIGMOD'03): rolling
  * 64-bit polynomial hash over every k-byte gram + monotonic-deque sliding
  * window minimum, fused into one O(len) loop per document. Guarantees any
  * shared substring of length ≥ w+k−1 between two documents yields a
  * shared fingerprint.
  *
  * This replaces the relational formulation (explode one row per char
  * position → per-doc window sort → global distinct), which pushed
  * ≈ corpus-bytes × 16 through two shuffles. Here the document row never
  * leaves its input partition: the expression returns the sorted distinct
  * fingerprint array in-row, so downstream per-doc summaries are
  * shuffle-free and the pairs-index form is a single explode.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowKernel {
  // FNV-1a 64-bit prime as the polynomial base; any odd 64-bit constant
  // works — fingerprints only need determinism, not a published hash.
  private val B = 1099511628211L

  /** Sorted distinct winnowing fingerprints of `text`'s UTF-8 bytes. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    // rolling hashes of all n k-grams
    val hs = new Array[Long](n)
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * bk) * B + (bytes(i + k - 1) & 0xff)
      hs(i) = h
      i += 1
    }
    val sel = new java.util.HashSet[java.lang.Long]()
    if (n <= w) {
      // fewer grams than a window: select the global minimum
      var m = hs(0)
      i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      sel.add(m)
    } else {
      // monotonic deque of indices; front is the min of the current window
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0
      i = 0
      while (i < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i
        tail += 1
        if (i >= w - 1) {
          while (dq(head) < i - w + 1) head += 1
          sel.add(hs(dq(head)))
        }
        i += 1
      }
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

object WinnowFingerprints {
  /** Column form: array<bigint> of sorted distinct fingerprints. */
  def apply(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, w))
}
