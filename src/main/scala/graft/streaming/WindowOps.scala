package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Window-aggregation builders shared between batch and streaming — the
  * batch/stream-unified query definition of SURVEY.md §7.0: the same
  * function is applied to a `spark.read` DataFrame (batch queries in
  * graft.queries.Temporal) and to a `readStream`/MemoryStream DataFrame
  * (streaming specs), mirroring Flink's RuntimeExecutionMode duality.
  *
  * Reference anchors: [U] flink-streaming-java api/windowing/assigners/
  * {Tumbling,Sliding,EventTimeSession}EventTimeWindows.java and the
  * TUMBLE/HOP/SESSION window TVFs.
  */
object WindowOps {

  /** TUMBLE(size) count+sum per event_type; emits window start. */
  def tumbleAgg(events: DataFrame, size: String): DataFrame =
    events
      .groupBy(window(col("ts"), size).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** HOP(size, slide) count per event_type. */
  def hopAgg(events: DataFrame, size: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("event_type"), col("n"))

  /** SESSION(gap) per user: count + span. */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    sessionAggDynamic(events, lit(gap))

  /** SESSION with a PER-EVENT gap expression ([U] flink-streaming-java
    * `SessionWindowTimeGapExtractor` — dynamic gaps): works identically
    * on batch and streaming frames, Spark's `session_window(ts, gapCol)`
    * merges the per-event windows behind the watermark.
    */
  def sessionAggDynamic(events: DataFrame, gap: Column): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("wstart"), col("w.end").as("wend"),
        col("user_id"), col("n_events"))
}
