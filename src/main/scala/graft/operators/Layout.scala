package graft.operators

import org.apache.spark.sql.DataFrame

/** Storage-layout levers for repeatedly-queried big tables ([U] the
  * reference's filesystem-connector partitioning + upstream bucketed
  * lake layouts; SURVEY.md §7.4 "partitioning & shuffle").
  *
  * Bucketing is THE lever for repeated equi-joins/aggregations on a
  * stable key at 100 TB: both sides pre-hashed into the same bucket
  * count makes the join co-located — no exchange of either table at
  * query time, verified by PartitionSpec's plan assertion. Partition
  * directories (`PARTITIONED BY` in the connector DDL, `partitionBy`
  * here) remain the pruning lever for selective scans; the two compose.
  */
object Layout {

  /** Write `df` as a bucketed external parquet table: rows are hash-
    * distributed into `buckets` files per partition by `bucketCol` and
    * sorted within each bucket by `sortCols` (defaults to the bucket
    * key — gives merge-join-ready runs and better scan locality).
    * Registered as `table` in the session catalog at `path`.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
