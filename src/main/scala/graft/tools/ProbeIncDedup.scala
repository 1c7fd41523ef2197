package graft.tools

import graft.{GraftSession, Tables}

/** Dev probe: incremental near-dup dedup throughput — the sf0.1
  * documents table streamed through IncrementalDedup in id-range
  * micro-batches against a fresh store.
  */
object ProbeIncDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "graft-probe-incdedup")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).select("doc_id", "text").cache()
    val total = docs.count()
    val store = java.nio.file.Files.createTempDirectory("inc_store").toString + "/fps"
    val nBatches = 5
    val per = total / nBatches + 1
    val t0 = System.nanoTime()
    var kept = 0L
    (0 until nBatches).foreach { i =>
      val batch = docs.filter(col("doc_id") >= i * per && col("doc_id") < (i + 1) * per)
      kept += graft.streaming.IncrementalDedup
        .processBatch(batch, "doc_id", "text", store, minSharedRatio = 0.95,
          batchId = i.toLong).count()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[incdedup] ratio=0.95 $total docs in $nBatches batches: ${total / sec}%.0f docs/s, kept=$kept, ${sec}%.1f s")
    spark.stop()
  }
}
