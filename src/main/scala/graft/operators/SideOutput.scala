package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Side outputs / late-data handling (SURVEY.md §2.2 "side outputs",
  * §2.5 "allowedLateness + late-data side output").
  *
  * The reference's `OutputTag` lets one operator emit to secondary
  * streams (classically: rows arriving behind the watermark). Spark has no
  * side-output primitive; the documented pattern is a tag column and two
  * filtered reads of one cached plan — same data, two outputs, single
  * upstream computation.
  */
object SideOutput {

  /** Split one DataFrame into (main, side) on a predicate. The input plan
    * is computed once per downstream action; persist upstream if both
    * branches are consumed in the same job and the source is expensive.
    */
  def split(df: DataFrame, sidePredicate: Column): (DataFrame, DataFrame) = {
    // NULL-safe: a NULL predicate (e.g. a NULL rowtime under lateData)
    // must not drop the row from BOTH outputs — it stays in the main one
    val tagged = df.withColumn("__side",
      org.apache.spark.sql.functions.coalesce(sidePredicate,
        org.apache.spark.sql.functions.lit(false)))
    (tagged.filter(!col("__side")).drop("__side"),
      tagged.filter(col("__side")).drop("__side"))
  }

  /** Late-data split against an explicit watermark column/value: rows with
    * `ts` at or behind the watermark go to the side output — the batch
    * analog of Flink's `sideOutputLateData(tag)`; in streaming, feed this
    * inside `foreachBatch` where the batch's watermark is known.
    */
  def lateData(df: DataFrame, tsCol: String, watermark: Column): (DataFrame, DataFrame) =
    split(df, col(tsCol) < watermark)
}
