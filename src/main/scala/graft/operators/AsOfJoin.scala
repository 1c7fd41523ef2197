package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal / as-of join — the reference's event-time temporal join
  * (`FOR SYSTEM_TIME AS OF a.rowtime`, [U] flink-table-runtime
  * operators/join/temporal/TemporalRowTimeJoinOperator.java). Spark has no
  * primitive, so this is the classic union + last-value-carry-forward plan
  * (SURVEY.md §7.4.2):
  *
  *  1. tag right rows 0 / left rows 1, union by name;
  *  2. one window per key ordered by (time, side): `last(rightPayload,
  *     ignoreNulls)` over unbounded-preceding..current carries the latest
  *     right version to each left row (right sorts before left at equal
  *     time, i.e. matches are `right.time <= left.time`);
  *  3. keep only left rows.
  *
  * Scale: a single hash shuffle on the key plus a per-key sort — the same
  * shape as a shuffled sort-merge join, no driver-side state, no broadcast
  * of the versioned side. Skewed keys serialize inside a partition; salt the
  * key upstream if one key dominates.
  *
  * Right rows should be unique per (keys, rightTime); pre-aggregate if not
  * (ties are broken deterministically by the payload struct, but which
  * version "wins" is then a convention, not semantics).
  */
object AsOfJoin {

  /** For each left row, attach the latest `rightVals` from the right row
    * with `right(rightTime) <= left(leftTime)` per `keys` (backward as-of).
    * Unmatched left rows keep null payloads (left-outer semantics).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rightVals.map(col): _*).as("__rv")): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(leftCols.map(col) ++ rightVals.map(v => col(s"__match.$v").as(v)): _*)
  }
}
