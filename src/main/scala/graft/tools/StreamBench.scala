package graft.tools

import graft.{GraftSession, Tables}
import graft.streaming.WindowOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming throughput bench (BASELINE.md row "streaming tumbling-window
  * agg over events via MemoryStream"): replays the sf events table
  * through MemoryStream in micro-batches into the shared tumbleAgg
  * builder with a 10 s watermark, reports rows/s end-to-end.
  */
object StreamBench {
  case class E(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchSize = if (args.length > 1) args(1).toInt else 10000
    val parts = if (args.length > 2) args(2).toInt else 32
    val changelog = args.length > 3 && args(3) == "changelog"
    // `hdfs` swaps in the in-JVM HDFSBackedStateStoreProvider — a plain
    // windowed agg doesn't need RocksDB (only transformWithState does),
    // and the per-micro-batch state commit is the measured bottleneck
    val hdfs = args.length > 3 && args(3) == "hdfs"
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("graft-streambench")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        changelog.toString)
    val spark = GraftSession.configure(builder, shufflePartitions = parts).getOrCreate()
    if (hdfs) spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val topn = args.length > 3 && args(3) == "topn"
    val rows = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[E].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[E]
    // `topn` drives the transformWithState stack (keyed state + per-id
    // upsert/retract) instead of the stateless windowed agg — the
    // BASELINE row for stateful-operator throughput
    val metric = if (topn) "stream_topn_rows_per_sec" else "stream_tumble_rows_per_sec"
    val out =
      if (topn)
        graft.streaming.StatefulOps.topN(
          input.toDF().select($"event_type".as("key"), $"event_id".as("id"),
            $"value".as("score")).as[graft.streaming.KeyedScored], 10)
          .toDF()
      else WindowOps.tumbleAgg(input.toDF().withWatermark("ts", "10 seconds"), "5 minutes")
    val q = out.writeStream.outputMode("append").format("noop").start()
    val t0 = System.nanoTime()
    try {
      rows.grouped(batchSize).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val rps = rows.length / sec
    println(f"""{"metric":"$metric","value":$rps%.0f,"unit":"rows/s","rows":${rows.length},"sec":$sec%.2f,"batch":$batchSize,"parts":$parts,"changelog":$changelog,"sf":"$dir"}""")
    spark.stop()
  }
}
