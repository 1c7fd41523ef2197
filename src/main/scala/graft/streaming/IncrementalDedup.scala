package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental near-duplicate dedup for a DOCUMENT STREAM — the crawl
  * ingestion shape: every micro-batch's documents are fingerprinted
  * (winnowing — shared substrings of length ≥ w+k−1 guarantee shared
  * fingerprints), checked against the persistent fingerprint STORE of
  * everything already accepted or rejected, and only novel documents
  * survive. [U] the reference's streaming deduplication operators
  * (flink-table-runtime operators/deduplicate/) keep exact keys in
  * keyed state; near-dup membership over a multi-valued key set maps
  * naturally onto the micro-batch + store-join formulation instead.
  *
  * Semantics per batch (deterministic): a document is DROPPED iff it
  * shares ≥ `minShared` fingerprints with the store or with a
  * same-batch document of smaller doc_id; its fingerprints enter
  * the store either way (a rejected near-dup still blocks its own
  * future copies, matching the sequential-reading semantics). Batch
  * internals are ordered by doc_id, so replays produce identical
  * verdicts.
  *
  * Scale shape: fingerprints and the store are narrow (fp, doc_id)
  * parquet rows; the membership check is one equi-join on fp per batch
  * (store side partitioned by fp hash on disk at real scale); no state
  * lives on the driver and no per-key JVM state grows unboundedly —
  * the store is a table, compactable and TTL-able like any table.
  */
object IncrementalDedup {

  /** Process one batch against the store at `storePath`; returns the
    * kept documents. Exposed for batch-incremental use and the
    * foreachBatch wiring in [[run]].
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      storePath: String, minShared: Int = 1, k: Int = 8, w: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val fps = graft.functions.TextFunctions
      .winnowFingerprints(batch.select(col(idCol), col(textCol)), Seq(idCol), textCol, k, w)
      .localCheckpoint(true)
    val store: DataFrame =
      if (pathExists(spark, storePath)) spark.read.parquet(storePath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fingerprint",
            org.apache.spark.sql.types.LongType))))
    // hits vs the persistent store
    val storeHits = fps.join(store.select("fingerprint").distinct(), Seq("fingerprint"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minShared)
      .select(col(idCol))
    // hits vs smaller-id documents of the SAME batch (deterministic
    // within-batch order: doc_id ascending); explicit renames keep the
    // self-join unambiguous
    val left = fps.select(col("fingerprint").as("__fp"), col(idCol))
    val peers = fps.select(col("fingerprint").as("__fp_p"), col(idCol).as("__peer"))
    val batchHits = left.join(peers,
        col("__fp") === col("__fp_p") && col("__peer") < col(idCol))
      .groupBy(col(idCol)).agg(countDistinct(col("__fp")).as("__n"))
      .filter(col("__n") >= minShared)
      .select(col(idCol))
    val dropped = storeHits.union(batchHits).distinct()
    val kept = batch.join(dropped, Seq(idCol), "left_anti")
    // every batch fingerprint enters the store (rejected docs still
    // block their own future copies); append keeps the write cheap
    fps.select("fingerprint").distinct()
      .write.mode("append").parquet(storePath)
    kept
  }

  /** Deploy over a streaming Dataset of documents: each micro-batch is
    * deduped against the store and the survivors land at `outPath`.
    */
  def run(docs: DataFrame, idCol: String, textCol: String, storePath: String,
      outPath: String, minShared: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_inc_dedup").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, textCol, storePath, minShared)
          .write.mode("append").parquet(outPath)
      }
      .start()
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
