package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming._

/** `CURRENT_WATERMARK()` — the reference's watermark-observation
  * function ([U] flink-table systemfunctions CURRENT_WATERMARK(rowtime);
  * SURVEY.md §2.8 temporal row): lets a streaming query SEE the
  * operator's current event-time watermark, the primitive behind
  * late-row tagging ("is this row behind the watermark?") and
  * watermark-lag monitoring.
  *
  * Spark has no expression for this — the watermark lives in the
  * engine, surfaced to user code only inside `transformWithState`'s
  * `TimerValues`. This operator is a stateless pass-through that stamps
  * every row with `getCurrentWatermarkInMs`, preserving Spark's
  * semantics: the value is the GLOBAL watermark of the current
  * micro-batch (computed at the previous batch boundary), so it lags
  * one trigger behind the data — exactly the per-batch analog of the
  * reference's "watermark as of when the row is processed". Before any
  * batch completes the stamp is 0; the reference returns NULL there
  * (documented delta — 0 and NULL are both "no watermark yet").
  *
  * Zero state is kept; the keyFn only routes rows (any key works — the
  * watermark is global), so parallelism is the input's partitioning.
  * The operator runs in `TimeMode.None`: event-time mode would have the
  * engine drop late rows BEFORE the stamp — the rows this function
  * exists to see — while the watermark itself stays readable from
  * `TimerValues` in any mode.
  */
object WatermarkOps {

  def withCurrentWatermark[K, T](ds: Dataset[T], keyFn: T => K)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(T, Long)]): Dataset[(T, Long)] =
    ds.groupByKey(keyFn)
      .transformWithState(new StampWatermark[K, T], TimeMode.None(),
        OutputMode.Append())

  /** Late-row classification against the observed watermark — the
    * reference docs' own CURRENT_WATERMARK use case
    * (`WHERE ts > CURRENT_WATERMARK(ts)`): rows whose event time is at
    * or behind the current watermark are tagged late. With Spark's
    * one-trigger watermark lag, a row can be tagged late here and still
    * have been accepted by downstream stateful operators in the same
    * batch — the conservative direction.
    */
  def tagLate[K, T](ds: Dataset[T], keyFn: T => K, eventTimeMs: T => Long)(
      implicit kEnc: Encoder[K], stampEnc: Encoder[(T, Long)],
      outEnc: Encoder[(T, Long, Boolean)]): Dataset[(T, Long, Boolean)] =
    withCurrentWatermark(ds, keyFn)
      .map(t => (t._1, t._2, eventTimeMs(t._1) <= t._2))
}

private class StampWatermark[K, T] extends KeyedProcess[K, T, (T, Long)] {
  override def onElement(key: K, v: T, tv: TimerValues,
      emit: ((T, Long)) => Unit): Unit =
    emit((v, tv.getCurrentWatermarkInMs()))
}
