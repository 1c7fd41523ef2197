package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Shared plumbing for the declared-query suite.
  *
  * Conventions (driver contract, see SparkEntry):
  *  - every query is `(SparkSession, sfDir) => DataFrame`;
  *  - column names match the oracle SQL exactly (the driver sorts columns
  *    by name before hashing);
  *  - double-typed aggregates are rounded on BOTH sides (Spark and DuckDB)
  *    so engine-order-of-summation noise cannot flip the hash: money-scale
  *    sums → 2 decimals, averages/ratios → 4, exact rationals → unrounded.
  */
object QueryDefs {
  type Q = (SparkSession, String) => DataFrame

  /** Literal for comparing against parquet TIMESTAMP_NTZ columns
    * (l_shipdate / o_orderdate load as timestamp_ntz in Spark 4).
    */
  def ntz(s: String): Column = lit(s).cast("timestamp_ntz")

  def money(c: Column): Column = round(c, 2)
  def rate(c: Column): Column = round(c, 4)
}
