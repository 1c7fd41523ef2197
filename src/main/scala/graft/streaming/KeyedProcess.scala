package graft.streaming

import org.apache.spark.sql.streaming._
import scala.collection.mutable.ArrayBuffer

/** Flink `KeyedProcessFunction`-shaped façade over Spark 4's
  * `StatefulProcessor` (SURVEY.md §7.4.4: build this once, then every
  * stateful custom operator — streaming Top-N, count windows, keep-last
  * dedup, temporal join, CEP — is written against the familiar
  * onElement/onTimer shape so reference semantics transfer legibly).
  *
  * Deltas vs Flink, by construction of Structured Streaming:
  *  - elements arrive per-key per-micro-batch (the iterator is unrolled
  *    here into per-element callbacks);
  *  - timers are the engine's (processing- or event-time per the
  *    `TimeMode` passed to `transformWithState`); watermark semantics are
  *    Spark's global-per-trigger watermark (SURVEY.md §2.10).
  *
  * State is created in [[open]] via the handle (value/list/map state with
  * optional TTL — the analog of Flink's StateTtlConfig).
  */
abstract class KeyedProcess[K, I, O] extends StatefulProcessor[K, I, O] {

  /** Create state handles here; called on operator (re)start. */
  def open(handle: StatefulProcessorHandle, outputMode: OutputMode, timeMode: TimeMode): Unit = ()

  /** Per-element hook; `emit` collects output rows. */
  def onElement(key: K, value: I, timers: TimerValues, emit: O => Unit): Unit

  /** Timer hook (register via [[registerTimer]]). */
  def onTimer(key: K, expiryMs: Long, timers: TimerValues, emit: O => Unit): Unit = ()

  final override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open(getHandle, outputMode, timeMode)

  final override def handleInputRows(key: K, rows: Iterator[I], tv: TimerValues): Iterator[O] = {
    val buf = ArrayBuffer.empty[O]
    rows.foreach(r => onElement(key, r, tv, buf += _))
    buf.iterator
  }

  final override def handleExpiredTimer(key: K, tv: TimerValues, info: ExpiredTimerInfo): Iterator[O] = {
    val buf = ArrayBuffer.empty[O]
    onTimer(key, info.getExpiryTimeInMs, tv, buf += _)
    buf.iterator
  }

  protected def registerTimer(ms: Long): Unit = getHandle.registerTimer(ms)
  protected def deleteTimer(ms: Long): Unit = getHandle.deleteTimer(ms)
}
