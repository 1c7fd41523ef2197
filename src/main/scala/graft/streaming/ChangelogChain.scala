package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming._

/** Changelog input for the retract-consuming Top-N: `row_kind` follows
  * Flink's RowKind ("+I"/"+U" upsert the id's score, "-U"/"-D" retract
  * it), `key` is the ranking partition, `id` the ranked entity.
  */
case class ChangeScored(row_kind: String, key: String, id: Long, score: Double)

/** Retract-consuming streaming Top-N — the reference's
  * RetractableTopNFunction proper ([U] flink-table-runtime
  * operators/rank/RetractableTopNFunction.java): unlike the append-only
  * [[StreamingTopN]] (bounded O(N) state, cannot promote on retraction),
  * this keeps EVERY current row of the ranking key in state, so a
  * retraction of a ranked row promotes the next-best row — exactly what
  * a changelog input (e.g. a refining group aggregate) requires. Flink
  * pays the same cost: its retractable rank keeps the full data state
  * keyed by sort key, because a retract stream can shrink any row.
  *
  * Emission: "+I"/"-D" diffs of the top-N set on every effective change,
  * so a downstream consumer reconstructs the current Top-N by applying
  * the changelog — and the whole operator chain nets to the batch
  * answer.
  */
class RetractableTopN(n: Int) extends KeyedProcess[String, ChangeScored, TopNChange] {
  // (id, score) pairs — the state encoder supports product lists, not maps
  @transient private var rows: ValueState[List[(Long, Double)]] = _

  override def open(h: StatefulProcessorHandle, om: OutputMode, tm: TimeMode): Unit = {
    implicit val enc: Encoder[List[(Long, Double)]] = ExpressionEncoder()
    rows = h.getValueState[List[(Long, Double)]]("rows", enc, TTLConfig.NONE)
  }

  private def topOf(m: List[(Long, Double)]): List[(Long, Double)] =
    m.sortBy { case (id, s) => (-s, id) }.take(n)

  override def onElement(key: String, v: ChangeScored, tv: TimerValues,
      emit: TopNChange => Unit): Unit = {
    val cur = Option(rows.get()).getOrElse(Nil)
    val without = cur.filterNot(_._1 == v.id)
    val next = v.row_kind match {
      case "-U" | "-D" => without
      case _ => (v.id, v.score) :: without // +I / +U upsert
    }
    if (next != cur) {
      if (next.isEmpty) rows.clear() else rows.update(next)
      val before = topOf(cur)
      val after = topOf(next)
      before.filterNot(after.contains).foreach { case (id, s) =>
        emit(TopNChange("-D", key, id, s))
      }
      after.filterNot(before.contains).foreach { case (id, s) =>
        emit(TopNChange("+I", key, id, s))
      }
    }
  }
}

/** Composability helpers for chaining changelog-emitting stateful
  * operators — the usability gap a Flink user hits first: in Flink the
  * planner threads retractions between operators automatically
  * ([U] FlinkChangelogModeInferenceProgram.scala); here the `row_kind`
  * column is explicit, and these combinators wire it from one
  * operator's output into the next operator's input.
  */
object ChangelogChain {

  /** Wire the retract-consuming Top-N onto a keyed changelog stream. */
  def retractableTopN(ds: Dataset[ChangeScored], n: Int): Dataset[TopNChange] = {
    implicit val out: Encoder[TopNChange] = Encoders.product[TopNChange]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new RetractableTopN(n), TimeMode.None(), OutputMode.Append())
  }

  /** The canonical Flink retract chain ([U] StreamExecGroupAggregate →
    * StreamExecRank): a refining streaming group aggregate feeds a
    * Top-N of the groups ranked by their aggregate, all in ONE streaming
    * query — the aggregate's "-U"/"+U" refinements flow into the rank
    * operator as retract/upsert, so the emitted Top-N changelog always
    * nets to the Top-N of the CURRENT aggregates.
    */
  def aggTopN(changes: Dataset[ChangeIn], n: Int): Dataset[TopNChange] = {
    val agg = GroupAgg.retractingAgg(changes)
    implicit val enc: Encoder[ChangeScored] = Encoders.product[ChangeScored]
    retractableTopN(
      agg.map(c => ChangeScored(c.row_kind, "all", c.key, c.sum_value)), n)
  }
}
