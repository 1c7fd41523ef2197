package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Datagen source — the reference's datagen connector ([U]
  * flink-connectors/flink-connector-datagen): a rate-driven stream (or a
  * bounded range in batch) whose typed columns derive deterministically
  * from the row sequence number, so tests and demos get reproducible
  * data without fixtures. Columns are hash-derived (xxhash64) — uniform
  * enough for load shaping, fully reproducible, no RNG state.
  */
object DataGen {

  /** Unbounded streaming generator: `rowsPerSecond` rows/s with typed
    * demo columns (key cardinality `nKeys`, value in [0,1000), ts =
    * source timestamp).
    */
  def stream(spark: SparkSession, rowsPerSecond: Int, nKeys: Int): DataFrame =
    shape(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load(), nKeys)

  /** Bounded batch generator with the same schema (Flink's
    * `env.fromSequence` / datagen bounded mode).
    */
  def batch(spark: SparkSession, nRows: Long, nKeys: Int): DataFrame =
    shape(spark.range(nRows).select(
      (org.apache.spark.sql.functions.current_timestamp()).as("timestamp"),
      col("id").as("value")), nKeys)

  private def shape(rate: DataFrame, nKeys: Int): DataFrame =
    rate.select(
      col("timestamp").as("ts"),
      col("value").as("seq"),
      pmod(xxhash64(col("value")), lit(nKeys.toLong)).as("key"),
      (pmod(xxhash64(col("value"), lit(1)), lit(100000L)).cast("double") / 100.0).as("amount"),
      concat(lit("u"), pmod(xxhash64(col("value"), lit(2)), lit(26L)) + 65).as("tag"))
}
