package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf0.001` (and 0.01, 0.1
  * siblings). These are plain
  * `spark.read.parquet` scans — filters/projections issued downstream are
  * pushed into the scan by Catalyst (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`), which is the 100 TB-scale posture: never materialize a
  * table wider or longer than the query needs.
  */
object Tables {
  val names: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Loader contract: `events.ts` always surfaces as `TimestampType`,
    * whatever parquet logical type the fixture generator emitted. Observed
    * layouts across driver regenerations:
    *   - INT64 TIMESTAMP(NANOS) → arrives as `LongType` nanos (under
    *     `spark.sql.legacy.parquet.nanosAsLong`); truncate to micros.
    *   - plain `timestamp[us]` without timezone → arrives as
    *     `TimestampNTZType`; cast to `TimestampType` (value-identical under
    *     the pinned UTC session zone).
    *   - micros with UTC adjustment → already `TimestampType`; pass through.
    * The oracle does `CAST(ts AS TIMESTAMP)` in DuckDB, which agrees with
    * all three. Pinned by the events-timestamp-layouts case in FormatsSpec.
    */
  private[graft] def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
}
