package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._
import graft.operators.Cep

/** Streaming CEP — MATCH_RECOGNIZE's `A B+ C WITHIN t` subset over an
  * unbounded keyed stream ([U] flink-cep nfa/NFA.java with its ordered
  * event buffer; SURVEY.md §7.4.5). The same pure NFA stepper as the
  * batch operator (Cep.step) runs here behind a watermark:
  *
  *  - out-of-order events buffer in ListState with a timer per event ts;
  *  - when the watermark passes, buffered events ≤ watermark are sorted
  *    and fed through the NFA whose register (Cep.NfaState) persists in
  *    ValueState across firings — so partial matches span micro-batches.
  *
  * State per key: the watermark-bounded buffer + one O(1) NFA register —
  * the same bound Flink's NFA carries for this pattern class.
  */
class StreamingCepProcess(a: String, b: String, c: String, withinMs: Long)
    extends KeyedProcess[Long, Cep.Event, Cep.Match] {
  @transient private var buf: ListState[Cep.Event] = _
  @transient private var reg: ValueState[Cep.NfaState] = _

  override def open(h: StatefulProcessorHandle, om: OutputMode, tm: TimeMode): Unit = {
    implicit val evEnc: Encoder[Cep.Event] = Encoders.product[Cep.Event]
    implicit val regEnc: Encoder[Cep.NfaState] = Encoders.product[Cep.NfaState]
    buf = h.getListState[Cep.Event]("buf", evEnc, TTLConfig.NONE)
    reg = h.getValueState[Cep.NfaState]("reg", regEnc, TTLConfig.NONE)
  }

  override def onElement(key: Long, v: Cep.Event, tv: TimerValues,
      emit: Cep.Match => Unit): Unit = {
    buf.appendValue(v)
    registerTimer(v.ts)
  }

  override def onTimer(key: Long, expiryMs: Long, tv: TimerValues,
      emit: Cep.Match => Unit): Unit = {
    val wm = math.max(tv.getCurrentWatermarkInMs, expiryMs)
    val (ready, pending) = buf.get().toArray.partition(_.ts <= wm)
    if (ready.nonEmpty) {
      var s = Option(reg.get()).getOrElse(Cep.idle)
      ready.sortBy(e => (e.ts, e.id)).foreach { e =>
        val (ns, m) = Cep.step(s, e, a, b, c, withinMs)
        s = ns
        m.foreach(emit)
      }
      reg.update(s)
      buf.clear()
      if (pending.nonEmpty) buf.appendList(pending)
    }
  }
}

object StreamingCep {
  /** `a b+ c WITHIN withinMs` over a watermarked keyed event stream. */
  def abcWithin(ds: Dataset[Cep.Event], a: String, b: String, c: String,
      withinMs: Long): Dataset[Cep.Match] = {
    implicit val out: Encoder[Cep.Match] = Encoders.product[Cep.Match]
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new StreamingCepProcess(a, b, c, withinMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
