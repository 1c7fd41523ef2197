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
  * Exactly-once under at-least-once replay: foreachBatch may re-run a
  * micro-batch whose store append already committed (e.g. the sink
  * write failed mid-batch, or the query was killed between the two
  * writes). Both writes are therefore keyed by the micro-batch id —
  * store rows carry a `batch_id` provenance column, the store read
  * EXCLUDES the current batch's own rows (so a replay cannot score its
  * documents against the fingerprints its failed attempt committed),
  * and both the store and the survivor output are written with dynamic
  * partition overwrite on `batch_id` (a replay replaces its own
  * partition instead of appending a duplicate). Combined with a
  * durable caller-supplied `checkpointLocation`, a killed query
  * restarted on the same checkpoint resumes at the committed offset
  * with no batch re-admitted or lost.
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
    *
    * `batchId` ≥ 0 keys the store write for idempotent replay (see the
    * class doc); the default −1 is the unmanaged-append mode for
    * callers that sequence batches themselves and never retry one.
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      storePath: String, minSharedRatio: Double = 0.5,
      k: Int = 8, w: Int = 4, batchId: Long = -1L): DataFrame = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val fps = graft.functions.TextFunctions
      .winnowFingerprints(batch.select(col(idCol), col(textCol)), Seq(idCol), textCol, k, w)
      .localCheckpoint(true)
    val store: DataFrame =
      if (pathExists(spark, storePath)) {
        val raw = spark.read.parquet(storePath)
        val tagged =
          if (raw.columns.contains("batch_id")) raw
          else raw.withColumn("batch_id", lit(-1L)) // pre-provenance store layout
        // replay safety: never score a batch against the fingerprints
        // its own failed attempt already committed
        if (batchId >= 0) tagged.filter(col("batch_id") =!= batchId) else tagged
      } else spark.createDataFrame(
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
    // block their own future copies); a keyed batch replaces its own
    // partition so a replayed batch cannot double-commit
    val fpOut = fps.select("fingerprint").distinct()
      .withColumn("batch_id", lit(math.max(batchId, -1L)))
    // one-time migration of a pre-provenance store (data files at the
    // directory root): partitioned writes on top of root files would mix
    // layouts and break partition discovery on the next read — move the
    // root files into their batch_id=-1 home first
    if (pathExists(spark, storePath)) {
      val p = new org.apache.hadoop.fs.Path(storePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rootFiles = fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      if (rootFiles.nonEmpty) {
        val legacy = new org.apache.hadoop.fs.Path(p, "batch_id=-1")
        fs.mkdirs(legacy)
        rootFiles.foreach { s =>
          if (!fs.rename(s.getPath, new org.apache.hadoop.fs.Path(legacy, s.getPath.getName)))
            throw new java.io.IOException(
              s"could not migrate pre-provenance store file ${s.getPath}")
        }
      }
    }
    if (batchId >= 0)
      fpOut.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(storePath)
    else
      fpOut.write.mode("append").partitionBy("batch_id").parquet(storePath)
    kept
  }

  /** Deploy over a streaming Dataset of documents: each micro-batch is
    * deduped against the store and the survivors land at `outPath`,
    * partitioned by micro-batch id (replays overwrite in place).
    * `checkpointLocation` must be a durable path — restarting the
    * stream on the same checkpoint resumes at the committed offset.
    */
  def run(docs: DataFrame, idCol: String, textCol: String, storePath: String,
      outPath: String, checkpointLocation: String,
      minSharedRatio: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, storePath, minSharedRatio,
            batchId = batchId)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(outPath)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactStore(batch.sparkSession, storePath, exclude = Some(batchId))
      }
      .start()
  }

  /** Fold the fingerprint store's batch partitions into one sorted,
    * deduped partition (batch_id = −1) — the store "is a table,
    * compactable like any table" claim made real; one small file per
    * past batch otherwise. Same replay contract as
    * [[StreamingCuration.compactStores]]: pass `exclude = Some(id)`
    * for the batch currently in flight (its partitions carry over
    * verbatim), or None at a quiescent point.
    */
  def compactStore(spark: SparkSession, storePath: String,
      exclude: Option[Long] = None): Unit =
    StreamingCuration.compactOne(spark, storePath, Seq("fingerprint"), exclude)

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a compaction that died between its renames leaves the store at
    // `__old` — restore before answering, or the store reads as empty
    // and every past duplicate is silently re-admitted
    StreamingCuration.recoverStore(fs, p)
    fs.exists(p)
  }
}
