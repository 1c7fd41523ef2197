package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Gram matrix X'X of an embedding column as ONE mergeable aggregate —
  * the reduction an embedding-whitening / PCA pass needs at 100 TB
  * scale: the d(d+1)/2 upper-triangle sums ride the ordinary
  * partial+final hash-agg machinery (map-side combine, one shuffled row
  * of d(d+1)/2 doubles per partition — d=64 → 2080 values), so the
  * embeddings themselves never shuffle and nothing depends on row
  * count. The eigen-decomposition downstream is a driver-local O(d²)
  * problem by design ([[graft.queries.Vector.pcaTopComponents]]), the
  * same bounded-side-input pattern as the IVF centroid collects.
  */
object GramAgg {
  private implicit val bufEnc: Encoder[Array[Double]] = ExpressionEncoder()
  private implicit val outEnc: Encoder[Seq[Double]] = ExpressionEncoder()

  /** Upper-triangle (row-major: (i,j) with j ≥ i at index
    * i*d - i*(i-1)/2 + (j-i)) sums of vᵢ·vⱼ over all rows.
    */
  def agg(d: Int): Aggregator[Seq[Float], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Float], Array[Double], Seq[Double]] {
      private val len = d * (d + 1) / 2
      def zero: Array[Double] = new Array[Double](len)
      def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
        if (v != null && v.length == d) {
          val a = v.toArray
          var i = 0
          var k = 0
          while (i < d) {
            val vi = a(i).toDouble
            var j = i
            while (j < d) { b(k) += vi * a(j); k += 1; j += 1 }
            i += 1
          }
        }
        b
      }
      def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
        var k = 0
        while (k < len) { b1(k) += b2(k); k += 1 }
        b1
      }
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] = bufEnc
      def outputEncoder: Encoder[Seq[Double]] = outEnc
    }

  /** `gram(embedding)` — one row of d(d+1)/2 upper-triangle sums. */
  def column(c: Column, d: Int): Column = udaf(agg(d)).apply(c)

  /** Double-input variant (same triangle layout) — the Hessian
    * reduction of the Newton trainer
    * ([[graft.operators.QualityClassifier.trainNewton]]), whose scaled
    * feature rows are array<double>.
    */
  def aggD(d: Int): Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      private val len = d * (d + 1) / 2
      def zero: Array[Double] = new Array[Double](len)
      def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
        if (v != null && v.length == d) {
          val a = v.toArray
          var i = 0
          var k = 0
          while (i < d) {
            val vi = a(i)
            var j = i
            while (j < d) { b(k) += vi * a(j); k += 1; j += 1 }
            i += 1
          }
        }
        b
      }
      def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
        var k = 0
        while (k < len) { b1(k) += b2(k); k += 1 }
        b1
      }
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] = bufEnc
      def outputEncoder: Encoder[Seq[Double]] = outEnc
    }

  /** Double-input `gram(v)` column. */
  def columnD(c: Column, d: Int): Column = udaf(aggD(d)).apply(c)

  /** Gram of the √s-scaled rows with the scale folded INTO the aggregate
    * (r15, §4 — same motivation as [[VecSumAgg.scaledColumn]]): each row
    * is scaled into a local buffer first and then accumulated, so the
    * arithmetic (x·s rounded once, then pairwise products) is
    * bit-identical to the old `transform(f, x -> x·s)` feed.
    */
  def scaledAggD(d: Int): Aggregator[(Seq[Double], Double), Array[Double], Seq[Double]] =
    new Aggregator[(Seq[Double], Double), Array[Double], Seq[Double]] {
      private val len = d * (d + 1) / 2
      def zero: Array[Double] = new Array[Double](len)
      def reduce(b: Array[Double], in: (Seq[Double], Double)): Array[Double] = {
        val v = in._1
        if (v != null && v.length == d) {
          val s = in._2
          val t = new Array[Double](d)
          var i = 0
          while (i < d) { t(i) = v(i) * s; i += 1 }
          i = 0
          var k = 0
          while (i < d) {
            val vi = t(i)
            var j = i
            while (j < d) { b(k) += vi * t(j); k += 1; j += 1 }
            i += 1
          }
        }
        b
      }
      def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
        var k = 0
        while (k < len) { b1(k) += b2(k); k += 1 }
        b1
      }
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] = bufEnc
      def outputEncoder: Encoder[Seq[Double]] = outEnc
    }

  def scaledColumnD(c: Column, scale: Column, d: Int): Column =
    udaf(scaledAggD(d)).apply(c, scale)
}
