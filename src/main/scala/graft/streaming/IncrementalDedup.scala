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
  * Semantics per batch (deterministic): a document is DROPPED iff the
  * CONTAINMENT ratio — the fraction of its fingerprints already in the
  * store or carried by a same-batch document of smaller doc_id —
  * reaches `minSharedRatio` (the standard winnowing containment score;
  * a ratio is corpus-robust where absolute overlap counts are not).
  * Its fingerprints enter the store either way (a rejected near-dup
  * still blocks its own future copies, matching sequential-reading
  * semantics). Batch internals are ordered by doc_id, so replays
  * produce identical verdicts.
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
      storePath: String, minSharedRatio: Double = 0.5,
      k: Int = 8, w: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
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
    // a (doc, fp) row is BLOCKED when the fp is in the store, or a
    // same-batch document with a smaller id carries it (per-fp window
    // min — one shuffle on fp, no self-join)
    val flagged = fps
      .join(store.select(col("fingerprint")).distinct()
        .withColumn("__in_store", lit(true)), Seq("fingerprint"), "left")
      .withColumn("__min_carrier",
        min(col(idCol)).over(Window.partitionBy(col("fingerprint"))))
      .withColumn("__blocked",
        coalesce(col("__in_store"), lit(false)) || col("__min_carrier") < col(idCol))
    val dropped = flagged.groupBy(col(idCol))
      .agg(avg(col("__blocked").cast("int")).as("__ratio"))
      .filter(col("__ratio") >= minSharedRatio)
      .select(col(idCol))
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
      outPath: String, minSharedRatio: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_inc_dedup").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, textCol, storePath, minSharedRatio)
          .write.mode("append").parquet(outPath)
      }
      .start()
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
