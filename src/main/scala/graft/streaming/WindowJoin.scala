package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming window join ([U] flink-table-runtime
  * operators/join/window/WindowJoinOperator: two window-TVF'd streams
  * joined per (window, key), state dropped when the window closes — the
  * streaming counterpart of the batch q135/q137/q138 SQL family).
  *
  * Spark-first shape: both sides carry a watermark on their event-time
  * column and derive the SAME tumbling `window(ts, size)` struct; the
  * join is then an ordinary stream-stream equi-join on (window, key).
  * Joining on a window column derived from a watermarked timestamp is
  * one of Structured Streaming's sanctioned state-cleanup conditions, so
  * per-window join state is evicted once the watermark passes window end
  * — the same bounded-state contract as Flink's WindowJoinOperator
  * (which buffers both sides per window and emits + purges at window
  * fire). Outer variants ride the same condition: the null-padded row
  * emits when the window can no longer match, exactly Flink's
  * left/right/full window-join semantics.
  *
  * Column contract: every non-key column is prefixed `l_` / `r_` (both
  * sides routinely share a schema — events vs events); the join keys
  * stay unprefixed. At 100 TB this is one shuffle per side on
  * (window, key) — the same partitioning the downstream per-window
  * aggregation reuses.
  */
object WindowJoin {

  /** Window join; `joinType` additionally accepts `left_semi` (native
    * stream-stream semi) and `left_anti`. Structured Streaming has no
    * stream-stream anti join, but the window shape gives an exact
    * emulation: LEFT OUTER on (window, key) emits the null-padded row
    * precisely when the window closes with no match — filtering to the
    * null-padded rows IS the window anti join (same rows, same timing as
    * Flink's). The anti output carries the left columns only.
    */
  def tumbling(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               size: String, delay: String, joinType: String = "inner"): DataFrame = {
    if (joinType == "left_anti") {
      // probe column: non-nullable marker from the right side — null in
      // the joined row ⇔ the window closed without a right match
      val probed = tumblingImpl(left, right.withColumn("__r_probe", lit(1)),
        key, tsCol, size, delay, "left_outer")
      return probed.filter(col("r___r_probe").isNull)
        .select(col("window") +: col(key) +:
          left.columns.filterNot(_ == key).map(c => col("l_" + c)): _*)
    }
    tumblingImpl(left, right, key, tsCol, size, delay, joinType)
  }

  private def tumblingImpl(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                           size: String, delay: String, joinType: String): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (c == key) d else d.withColumnRenamed(c, p + c)
      }
      renamed
        .withWatermark(p + tsCol, delay)
        .withColumn("window", window(col(p + tsCol), size))
        // the window struct is now the side's ONE event-time column (the
        // Flink TVF likewise replaces rowtime with window_time): strip
        // the watermark tag from the raw ts so the symmetric-hash join
        // sees a single event-time column per side even when the caller
        // keeps l_ts/r_ts in the output
        .withColumn(p + tsCol,
          col(p + tsCol).as(p + tsCol, org.apache.spark.sql.types.Metadata.empty))
    }
    side(left, "l_").join(side(right, "r_"), Seq("window", key), joinType)
  }
}
