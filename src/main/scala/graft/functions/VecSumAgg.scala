package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise sum of an `array<double>` column as ONE mergeable
  * aggregate — the reduction a full-batch gradient step needs at scale
  * (same posture as [[GramAgg]]): per-row vectors fold into a d-length
  * buffer on the map side, one d-double row shuffles per partition, and
  * the result is a single driver-side array regardless of row count.
  */
object VecSumAgg {
  private implicit val bufEnc: Encoder[Array[Double]] = ExpressionEncoder()
  private implicit val outEnc: Encoder[Seq[Double]] = ExpressionEncoder()

  def agg(d: Int): Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      def zero: Array[Double] = new Array[Double](d)
      def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
        if (v != null) {
          val n = math.min(d, v.length)
          var i = 0
          while (i < n) { b(i) += v(i); i += 1 }
        }
        b
      }
      def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
        var i = 0
        while (i < d) { b1(i) += b2(i); i += 1 }
        b1
      }
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] = bufEnc
      def outputEncoder: Encoder[Seq[Double]] = outEnc
    }

  def column(c: Column, d: Int): Column = udaf(agg(d)).apply(c)

  /** Σ scale·v — the gradient reduction with the per-row scale folded
    * INTO the aggregate (r15, §4): the `transform(f, x -> x·g)` feeding
    * the plain sum ran as an interpreted higher-order function
    * allocating one array per row in the training hot path. Bit-identical
    * accumulation (multiply-then-add in the same order).
    */
  def scaledAgg(d: Int): Aggregator[(Seq[Double], Double), Array[Double], Seq[Double]] =
    new Aggregator[(Seq[Double], Double), Array[Double], Seq[Double]] {
      def zero: Array[Double] = new Array[Double](d)
      def reduce(b: Array[Double], in: (Seq[Double], Double)): Array[Double] = {
        val v = in._1
        if (v != null) {
          val s = in._2
          val n = math.min(d, v.length)
          var i = 0
          while (i < n) { b(i) += v(i) * s; i += 1 }
        }
        b
      }
      def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
        var i = 0
        while (i < d) { b1(i) += b2(i); i += 1 }
        b1
      }
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] = bufEnc
      def outputEncoder: Encoder[Seq[Double]] = outEnc
    }

  def scaledColumn(c: Column, scale: Column, d: Int): Column =
    udaf(scaledAgg(d)).apply(c, scale)
}
