package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** User-defined TABLE aggregate functions — the reference's
  * `TableAggregateFunction` ([U] flink-table/flink-table-common/.../
  * functions/TableAggregateFunction.java; SURVEY.md §2.9 UDF table row):
  * an aggregate that emits MULTIPLE rows per group (`emitValue`), with
  * the changelog variant (`emitUpdateWithRetract`) produced by the
  * streaming runner in [[graft.streaming.TableAggStream]] rather than by
  * the function author — the runner diffs consecutive `emitValue` sets
  * and emits "+I"/"-D" changes, which is the net-equivalent algebra and
  * spares every UDF a hand-written retraction bookkeeping pass.
  *
  * `accumulate`/`merge` make the function mergeable: the batch runner
  * folds each group in ONE pass over the grouped iterator (no
  * materialization — per-task memory is the accumulator, not the group),
  * so a bounded accumulator (Top2 keeps two pairs) holds at any group
  * size. `retract` is for changelog INPUTS (a "-D"/"-U" row un-applies
  * an insert); functions whose accumulator is lossy (Top2) leave it
  * unsupported, exactly as the reference's basic Top2 example does.
  */
trait TableAggregateFunction[IN, ACC, OUT] extends Serializable {
  def createAccumulator(): ACC
  def accumulate(acc: ACC, in: IN): ACC
  def merge(a: ACC, b: ACC): ACC
  /** Emit the group's current result rows (Flink's `emitValue`). */
  def emitValue(acc: ACC): Seq[OUT]
  /** Un-apply one input (changelog input support); lossy accumulators
    * may leave this unsupported.
    */
  def retract(acc: ACC, in: IN): ACC =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} does not support retraction")

  /** Adapt the function to a wider input row (the Table API's implicit
    * column projection when calling a UDF with a subset of columns).
    */
  def contramap[IN2](g: IN2 => IN): TableAggregateFunction[IN2, ACC, OUT] = {
    val self = this
    new TableAggregateFunction[IN2, ACC, OUT] {
      def createAccumulator(): ACC = self.createAccumulator()
      def accumulate(acc: ACC, in: IN2): ACC = self.accumulate(acc, g(in))
      def merge(a: ACC, b: ACC): ACC = self.merge(a, b)
      def emitValue(acc: ACC): Seq[OUT] = self.emitValue(acc)
      override def retract(acc: ACC, in: IN2): ACC = self.retract(acc, g(in))
    }
  }
}

/** The reference documentation's canonical table aggregate: per group
  * the top-2 (id, value) pairs with their rank ([U] flink docs
  * dev/table/functions/udfs "Table Aggregate Functions", Top2Accum).
  * Ordering is value DESC then id ASC, so results are deterministic
  * under ties; the accumulator is the two best pairs — O(1) state.
  */
class Top2 extends TableAggregateFunction[(Long, Double), List[(Long, Double)], (Long, Double, Int)] {
  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  def createAccumulator(): List[(Long, Double)] = Nil

  def accumulate(acc: List[(Long, Double)], in: (Long, Double)): List[(Long, Double)] =
    (in :: acc).sortWith(better).take(2)

  def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    (a ++ b).sortWith(better).take(2)

  def emitValue(acc: List[(Long, Double)]): Seq[(Long, Double, Int)] =
    acc.zipWithIndex.map { case ((id, v), i) => (id, v, i + 1) }
}

object TableAgg {

  /** Batch runner: `flatAggregate` on a grouped Dataset ([U] Flink Table
    * API `groupBy(...).flatAggregate(call(...)).select(...)`). One
    * shuffle on the key, then a single fold per group — Spark's
    * partial-aggregation doesn't apply to flatMapGroups, but the
    * accumulator fold keeps task memory at O(|acc|) and the emitValue
    * expansion is streamed out, so the shape holds at any group size.
    */
  def flatAggregate[K, IN, ACC, OUT](
      ds: Dataset[IN], keyFn: IN => K, f: TableAggregateFunction[IN, ACC, OUT])(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, OUT)]): Dataset[(K, OUT)] =
    ds.groupByKey(keyFn)
      .flatMapGroups { (k: K, it: Iterator[IN]) =>
        val acc = it.foldLeft(f.createAccumulator())(f.accumulate)
        f.emitValue(acc).iterator.map(o => (k, o))
      }

  /** Batch runner over a changelog input: rows tagged "+I"/"+U"
    * accumulate, "-D"/"-U" retract — the reference's table aggregate
    * consuming an update stream. Requires `f.retract`.
    */
  def flatAggregateChangelog[K, IN, ACC, OUT](
      ds: Dataset[(String, IN)], keyFn: IN => K, f: TableAggregateFunction[IN, ACC, OUT])(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, OUT)]): Dataset[(K, OUT)] =
    ds.groupByKey(t => keyFn(t._2))
      .flatMapGroups { (k: K, it: Iterator[(String, IN)]) =>
        // Spark gives NO within-group order after the shuffle, so a
        // retract could otherwise run before its matching insert
        // (negative/validating accumulators break nondeterministically).
        // For a BATCH changelog the net state is inserts minus retracts
        // whatever the interleaving — apply every accumulate first, then
        // every retract, a deterministic valid order. One streaming pass:
        // inserts fold inline, only the retracts (typically a small
        // minority of a changelog) buffer — O(retracts) memory, not
        // O(group)
        val retracts = scala.collection.mutable.ArrayBuffer.empty[IN]
        val afterIns = it.foldLeft(f.createAccumulator()) {
          case (a, ("-D" | "-U", in)) => retracts += in; a
          case (a, (_, in))           => f.accumulate(a, in)
        }
        val acc = retracts.foldLeft(afterIns)(f.retract)
        f.emitValue(acc).iterator.map(o => (k, o))
      }
}
