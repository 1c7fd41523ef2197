package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming._

case class TimedValue(key: Long, id: Long, ts_ms: Long, value: Double)
case class GapSession(key: Long, n_events: Long, sum_value: Double, start_ms: Long, end_ms: Long)

/** Event-time-timer demonstration operator: a custom gap-session window
  * built directly on KeyedProcess timers — the exact mechanics of Flink's
  * `KeyedProcessFunction#onTimer` + `TimerService.registerEventTimeTimer`
  * ([U] flink-streaming-java api/functions/KeyedProcessFunction.java;
  * SURVEY.md §2.2 "process + timers").
  *
  * Per key: accumulate (n, sum, min/max ts); on each element (re)register
  * an event-time timer at last_ts + gap; when the watermark passes it, the
  * timer fires → emit the closed session and clear state. Equivalent to
  * session_window aggregation, but expressed through the timer API — the
  * point is exercising timers, late re-registration, and state clearing.
  */
class GapSessionProcess(gapMs: Long)
    extends KeyedProcess[Long, TimedValue, GapSession] {
  @transient private var acc: ValueState[GapSession] = _
  @transient private var pendingTimer: ValueState[Long] = _

  override def open(h: StatefulProcessorHandle, om: OutputMode, tm: TimeMode): Unit = {
    implicit val gsEnc: Encoder[GapSession] = ExpressionEncoder()
    acc = h.getValueState[GapSession]("acc", gsEnc, TTLConfig.NONE)
    pendingTimer = h.getValueState[Long]("timer", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def onElement(key: Long, v: TimedValue, tv: TimerValues,
      emit: GapSession => Unit): Unit = {
    val cur = Option(acc.get()).getOrElse(GapSession(key, 0L, 0.0, v.ts_ms, v.ts_ms))
    // gap exceeded within a batch: close the previous session inline
    // (the timer handles the cross-batch case)
    if (cur.n_events > 0 && v.ts_ms - cur.end_ms > gapMs) {
      emit(cur)
      acc.update(GapSession(key, 1L, v.value, v.ts_ms, v.ts_ms))
    } else {
      acc.update(GapSession(key, cur.n_events + 1, cur.sum_value + v.value,
        math.min(cur.start_ms, v.ts_ms), math.max(cur.end_ms, v.ts_ms)))
    }
    // slide the session-close timer to last_ts + gap
    Option(pendingTimer.get()).filter(_ > 0).foreach(deleteTimer)
    val t = acc.get().end_ms + gapMs
    registerTimer(t)
    pendingTimer.update(t)
  }

  override def onTimer(key: Long, expiryMs: Long, tv: TimerValues,
      emit: GapSession => Unit): Unit = {
    Option(acc.get()).filter(_.n_events > 0).foreach { s =>
      emit(s)
      acc.clear()
      pendingTimer.clear()
    }
  }
}

object TimerOps {
  /** Gap sessions via event-time timers; `ds` must carry a watermark on an
    * event-time column for TimeMode.EventTime.
    */
  def gapSessions(ds: Dataset[TimedValue], gapMs: Long): Dataset[GapSession] = {
    implicit val out: Encoder[GapSession] = Encoders.product[GapSession]
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new GapSessionProcess(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
