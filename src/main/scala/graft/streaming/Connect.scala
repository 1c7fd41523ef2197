package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** ConnectedStreams sugar — the reference's two-input operator pattern
  * ([U] flink-streaming-java api/datastream/ConnectedStreams.java;
  * SURVEY.md §2.2 "connect"): Spark's transformWithState takes ONE keyed
  * input, so two streams are encoded as a union of side-tagged rows. The
  * stateful operators built this way (TemporalJoin, SemiAntiJoin) consume
  * the `TemporalIn` shape produced here.
  */
object Connect {

  /** Project one input onto the standard tagged shape; column names are
    * per side because the two inputs rarely share a schema.
    */
  def side(df: DataFrame, sideTag: Int,
      keyCol: String, idCol: String, tsCol: String, valueCol: String): DataFrame =
    df.select(
      col(keyCol).cast("long").as("key"),
      lit(sideTag).as("side"),
      col(idCol).cast("long").as("id"),
      unix_millis(col(tsCol).cast("timestamp")).as("ts_ms"),
      col(valueCol).cast("double").as("value"))

  /** Union a build side (side 0) and probe side (side 1) already in
    * tagged shape (from [[side]]) into the keyed operator input.
    */
  def connect(build: DataFrame, probe: DataFrame)(
      implicit enc: Encoder[TemporalIn]): Dataset[TemporalIn] =
    build.unionByName(probe).as[TemporalIn]
}
