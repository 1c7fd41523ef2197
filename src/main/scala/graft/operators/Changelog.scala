package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog / CDC-format handling (SURVEY.md §2.1 "CDC formats" and
  * §7.4.1 row_kind convention).
  *
  * The reference decodes debezium-/canal-/maxwell-json into rows tagged
  * with a RowKind (INSERT / UPDATE_BEFORE / UPDATE_AFTER / DELETE).
  * Spark has no changelog streams, so the convention here is an explicit
  * `row_kind` column ("+I" / "-U" / "+U" / "-D") carried alongside the
  * payload — the same encoding our stateful operators (StreamingTopN,
  * KeepLastDedup) emit.
  */
object Changelog {

  /** Decode debezium-style JSON (`{"before":…,"after":…,"op":"c|u|d"}`)
    * into row_kind-tagged payload rows. Updates expand to two rows
    * (UPDATE_BEFORE from `before`, UPDATE_AFTER from `after`), exactly the
    * reference's retract encoding.
    *
    * @param payloadSchema DDL of the before/after record, e.g. "id BIGINT, v DOUBLE"
    */
  def fromDebeziumJson(df: DataFrame, jsonCol: String, payloadSchema: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      s"before STRUCT<$payloadSchema>, after STRUCT<$payloadSchema>, op STRING")
    val parsed = df.withColumn("__cdc", from_json(col(jsonCol), schema))
    val op = col("__cdc.op")
    val rows = parsed.select(
      explode(
        when(op === "c", array(struct(lit("+I").as("row_kind"), col("__cdc.after").as("payload"))))
          .when(op === "d", array(struct(lit("-D").as("row_kind"), col("__cdc.before").as("payload"))))
          .when(op === "u", array(
            struct(lit("-U").as("row_kind"), col("__cdc.before").as("payload")),
            struct(lit("+U").as("row_kind"), col("__cdc.after").as("payload"))))
      ).as("r"))
    rows.select(col("r.row_kind").as("row_kind"), col("r.payload.*"))
  }

  /** Materialize a changelog to current state: net surviving rows are
    * those whose (payload) insert count exceeds retract count. For a
    * well-formed changelog keyed by `keys` this is "apply the log":
    * last non-retracted version per key wins by `seqCol` order.
    */
  def materialize(changelog: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("row_kind").isin("-D", "-U"))
      .drop("__rn")
  }

  /** Convenience predicate columns. */
  def isInsert(rowKind: Column): Column = rowKind.isin("+I", "+U")
  def isRetract(rowKind: Column): Column = rowKind.isin("-D", "-U")
}
