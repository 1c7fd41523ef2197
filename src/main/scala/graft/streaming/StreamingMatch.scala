package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.Cep
import graft.plans.MatchRecognize

/** Streaming MATCH_RECOGNIZE kernel — the measured, string-keyed
  * counterpart of [[StreamingPatternProcess]] ([U] flink-table-runtime
  * operators/match/ — Flink's MATCH_RECOGNIZE is streaming-first and
  * carries its MEASURES through the NFA). Events buffer in ListState
  * until the watermark passes; the shared measured scan
  * ([[MatchRecognize.scanMeasured]] — the exact batch kernel) emits only
  * RESOLVED matches with their measure values, and consumed events are
  * physically dropped from state, so state per key is the pending suffix
  * + in-flight events — the same bound the unmeasured process carries.
  *
  * The key is a STRING (the partition column's canonical string form,
  * cast back to the original type on output), so any atomic partition
  * key works — not just integral ones.
  */
class StreamingMatchProcess(
    stepAlts: IndexedSeq[IndexedSeq[Cep.Step]],
    stepVarsAlts: IndexedSeq[IndexedSeq[Seq[(String, Int)]]],
    measures: Seq[MatchRecognize.Measure], strOrd: Array[Boolean],
    withinMs: Long, skip: Cep.AfterMatch,
    subsets: Map[String, Seq[String]])
    extends KeyedProcess[String, StreamingMatch.MrSEvent, StreamingMatch.MrSMatch] {
  @transient private var buf: ListState[StreamingMatch.MrSEvent] = _

  override def open(h: StatefulProcessorHandle, om: OutputMode, tm: TimeMode): Unit = {
    implicit val evEnc: Encoder[StreamingMatch.MrSEvent] =
      Encoders.product[StreamingMatch.MrSEvent]
    buf = h.getListState[StreamingMatch.MrSEvent]("buf", evEnc, TTLConfig.NONE)
  }

  override def onElement(key: String, v: StreamingMatch.MrSEvent, tv: TimerValues,
      emit: StreamingMatch.MrSMatch => Unit): Unit = {
    buf.appendValue(v)
    registerTimer(v.ord)
  }

  override def onTimer(key: String, expiryMs: Long, tv: TimerValues,
      emit: StreamingMatch.MrSMatch => Unit): Unit = {
    val wm = math.max(tv.getCurrentWatermarkInMs, expiryMs)
    val (readyRaw, pending) = buf.get().toArray.partition(_.ord <= wm)
    if (readyRaw.nonEmpty) {
      val ready = readyRaw.sortBy(_.ord)
      val (matches, resume) = MatchRecognize.scanMeasured(
        ready.map(_.ord), ready.map(_.mask),
        i => ready(i).mv, i => ready(i).sv,
        stepAlts, stepVarsAlts, measures, strOrd,
        withinMs, skip, openEnded = true, wm = wm, subsets = subsets)
      matches.foreach(m =>
        emit(StreamingMatch.MrSMatch(key, m.start, m.end, m.n, m.m, m.sm)))
      buf.clear()
      val keep = ready.drop(resume) ++ pending
      if (keep.nonEmpty) {
        buf.appendList(keep)
        // pending events need a revisit when the watermark advances —
        // their own ord-timers have already fired
        registerTimer(wm + 1)
      }
    }
  }
}

object StreamingMatch {
  /** One tagged input row: the order value (also the event time, ms),
    * the DEFINE bitmask, and the per-measure numeric/string views.
    */
  final case class MrSEvent(key: String, ord: Long, mask: Long,
      mv: Seq[Double], sv: Seq[String])

  /** One resolved match with its measure values — the batch
    * `MrMatchM` shape, keyed by the canonical string key.
    */
  final case class MrSMatch(key: String, match_start: Long, match_end: Long,
      n_events: Int, m: Seq[Double], sm: Seq[String])

  /** Run the measured pattern over a watermarked keyed event stream. */
  def run(ds: Dataset[MrSEvent],
      stepAlts: IndexedSeq[IndexedSeq[Cep.Step]],
      stepVarsAlts: IndexedSeq[IndexedSeq[Seq[(String, Int)]]],
      measures: Seq[MatchRecognize.Measure], strOrd: Array[Boolean],
      withinMs: Long, skip: Cep.AfterMatch,
      subsets: Map[String, Seq[String]] = Map.empty): Dataset[MrSMatch] = {
    implicit val out: Encoder[MrSMatch] = Encoders.product[MrSMatch]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(
        new StreamingMatchProcess(stepAlts, stepVarsAlts, measures, strOrd,
          withinMs, skip, subsets),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
