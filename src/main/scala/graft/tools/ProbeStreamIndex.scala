package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.StreamingIndex

/** Dev probe: incremental BM25 index maintenance at two scales — index
  * the documents table in `nBatches` id-range batches (per-batch wall),
  * compact, then time a search against the accumulated store. Prints one
  * JSON line per batch/search so the BASELINE claims are attributable.
  * Usage: runMain graft.tools.ProbeStreamIndex [dir] [nBatches]
  */
object ProbeStreamIndex {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) Seq(args(0))
      else Seq("/root/testdata/sf0.1", "/tmp/sf10")
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val queries = Seq(1 -> Seq("dup", "merge", "batch"),
      2 -> Seq("vector", "stream", "window"))
    val spark = GraftSession.local(32, "graft-probe-sidx")
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      val store = java.nio.file.Files
        .createTempDirectory("graft_probe_sidx").toString + "/idx"
      try {
        val docs = spark.read.parquet(s"$d/documents.parquet")
        val maxId = docs.agg(max("doc_id")).head().getLong(0)
        val step = maxId / nBatches + 1
        var total = 0L
        (0 until nBatches).foreach { i =>
          val b = docs.filter(col("doc_id") >= i * step &&
            col("doc_id") < (i + 1) * step)
          val n = b.count(); total += n
          val t0 = System.nanoTime()
          StreamingIndex.indexBatch(b, "doc_id", "text", store, i.toLong)
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"sidx_batch","dir":"$d","batch":$i,"docs":$n,"sec":$sec%.3f,"docs_per_sec":${(n / sec).toLong}}""")
        }
        val tc = System.nanoTime()
        StreamingIndex.compactIndex(spark, store, "doc_id")
        val csec = (System.nanoTime() - tc) / 1e9
        val ts = System.nanoTime()
        val rows = StreamingIndex
          .searchBm25(spark, store, "doc_id", queries, 10).count()
        val ssec = (System.nanoTime() - ts) / 1e9
        println(f"""{"probe":"sidx_search","dir":"$d","ingested":$total,"compact_sec":$csec%.3f,"search_sec":$ssec%.3f,"rows":$rows}""")
      } finally graft.streaming.StreamingCuration.deleteStore(
        new java.io.File(store).getParent)
    }
    spark.stop()
  }
}
