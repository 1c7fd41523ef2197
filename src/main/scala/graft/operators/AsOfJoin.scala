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
    * `toleranceMs > 0` additionally requires
    * `left(leftTime) − right(rightTime) <= tolerance` (pandas
    * merge_asof-style staleness bound).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      toleranceMs: Long = 0L): DataFrame =
    directional(left, right, keys, leftTime, rightTime, rightVals, toleranceMs,
      forward = false)

  /** Forward as-of: the EARLIEST right row with
    * `right(rightTime) >= left(leftTime)` per key (within tolerance if
    * given) — implemented as backward over reversed time.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      toleranceMs: Long = 0L): DataFrame =
    directional(left, right, keys, leftTime, rightTime, rightVals, toleranceMs,
      forward = true)

  private def directional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      toleranceMs: Long,
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct((col(rightTime).as("__rt") +: rightVals.map(col)): _*).as("__rv")): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // forward = backward over reversed time: order desc, rights still
    // sort before lefts at equal time (side 0 first) so ties match
    val ord =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__rv").desc)
      else Seq(col("__t").asc, col("__side").asc, col("__rv").asc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance units: ms for timestamp time columns; the column's native
    // units for numeric time columns
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    def epoch(c: org.apache.spark.sql.Column) = unioned.schema("__t").dataType match {
      case TimestampType    => unix_millis(c)
      case TimestampNTZType => unix_millis(c.cast("timestamp"))
      case _                => c
    }
    val gap =
      if (forward) epoch(col("__match.__rt")) - epoch(col("__t"))
      else epoch(col("__t")) - epoch(col("__match.__rt"))
    val bounded =
      if (toleranceMs > 0)
        withMatch.withColumn("__match",
          when(col("__match").isNotNull && gap <= toleranceMs, col("__match")))
      else withMatch
    bounded.select(leftCols.map(col) ++ rightVals.map(v => col(s"__match.$v").as(v)): _*)
  }
}
