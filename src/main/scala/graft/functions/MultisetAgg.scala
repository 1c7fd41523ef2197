package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Flink's `COLLECT` aggregate returns `MULTISET<T>`, which Flink represents
  * internally as a map element→count (SURVEY.md §1.2 "MULTISET"). Spark has
  * no multiset aggregate, so this is a typed `Aggregator` producing
  * `map<string,bigint>` — mergeable (associative/commutative), so Spark runs
  * it partial+final with map-side combine; state is bounded by the number of
  * distinct values per group, which is the same bound Flink's COLLECT carries.
  */
object MultisetAgg {
  private implicit val mapEnc: Encoder[Map[String, Long]] = ExpressionEncoder()

  val agg: Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], a: String): Map[String, Long] =
        if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
      def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
        b2.foldLeft(b1) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
      def finish(r: Map[String, Long]): Map[String, Long] = r
      def bufferEncoder: Encoder[Map[String, Long]] = mapEnc
      def outputEncoder: Encoder[Map[String, Long]] = mapEnc
    }

  private lazy val fn = udaf(agg)

  /** `collect(c)` as a multiset column: map<value, count>. */
  def column(c: Column): Column = fn(c)
}
