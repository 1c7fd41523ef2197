package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flink's CUMULATE window TVF ([U] flink-table-runtime operators/window/
  * slicing operators; SURVEY.md §2.5): expanding windows from a shared
  * start — a row at offset `o` inside its `maxSize` bucket belongs to every
  * step-aligned window ending after `o`.
  *
  * Spark has no primitive, so each row is exploded into the windows that
  * cover it (at most maxSize/step copies — bounded fan-out, shuffle-free;
  * the subsequent groupBy is a plain hash aggregate). This is the
  * documented emulation path from SURVEY.md §7.3 ("custom, thin").
  */
object Cumulate {

  /** Adds `w_start` / `w_end` timestamp columns, one output row per
    * (input row × covering cumulate window). `maxSizeMs` must be a
    * multiple of `stepMs`.
    */
  def assign(df: DataFrame, tsCol: String, maxSizeMs: Long, stepMs: Long): DataFrame = {
    require(maxSizeMs % stepMs == 0, s"maxSize ($maxSizeMs) must be a multiple of step ($stepMs)")
    val nSteps = maxSizeMs / stepMs
    // integer FLOOR division (not `div`, which truncates toward zero and
    // misassigns pre-epoch rowtimes — the same rule as WindowTvf's
    // floordiv), exact bucket edges in long arithmetic
    df.withColumn("__em", expr(s"unix_millis(cast($tsCol as timestamp))"))
      .withColumn("__base", expr(
        s"((__em div ${maxSizeMs}L) + (CASE WHEN __em % ${maxSizeMs}L < 0 THEN -1 ELSE 0 END)) * ${maxSizeMs}L"))
      .withColumn("__k",
        explode(expr(s"sequence(((__em - __base) div ${stepMs}L) + 1L, ${nSteps}L)")))
      .withColumn("w_start", timestamp_millis(col("__base")))
      .withColumn("w_end", timestamp_millis(expr(s"__base + __k * ${stepMs}L")))
      .drop("__em", "__base", "__k")
  }
}
