package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{WindowRank, WinRankIn, WinRankOut}

/** Streaming window Top-N (WindowRankOperator semantics): per closed
  * tumbling window × key, the appended rows equal the batch
  * `rank() OVER (PARTITION BY window, key ORDER BY score DESC, id)`
  * filtered to rn<=N — the q09 shape, windowed.
  */
case class WRaw(key: String, id: Long, ts: java.sql.Timestamp, score: Double)

class WindowRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def raw(key: String, id: Long, sec: Long, score: Double) =
    WRaw(key, id, new java.sql.Timestamp(sec * 1000), score)

  test("streaming window top-n equals batch windowed rank on out-of-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val windowMs = 10000L
    // two 10s windows [1000,1010) and [1010,1020), two keys, out of order
    val rows = Seq(
      raw("a", 1, 1003, 5.0), raw("a", 2, 1001, 9.0), raw("b", 3, 1002, 1.0),
      raw("a", 4, 1007, 7.0), raw("a", 5, 1005, 9.0), raw("b", 6, 1008, 4.0),
      raw("a", 7, 1012, 2.0), raw("b", 8, 1011, 8.0), raw("a", 9, 1015, 6.0),
      raw("a", 10, 1016, 6.0), raw("b", 11, 1013, 3.0), raw("b", 12, 1019, 7.0))
    val input = MemoryStream[WRaw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"score").as[WinRankIn]
    val q = WindowRank.windowTopN(
        toIn(input.toDF().withWatermark("ts", "2 seconds")), windowMs, 2)
      .writeStream.outputMode("append").format("memory").queryName("winrank_out").start()
    try {
      input.addData(rows.take(6): _*); q.processAllAvailable()
      input.addData(rows.drop(6): _*); q.processAllAvailable()
      input.addData(raw("z", 99, 2000, 0.0)) // sentinel closes both windows
      q.processAllAvailable()
      val got = spark.table("winrank_out").as[WinRankOut].collect()
        .filter(_.key != "z")
        .map(o => (o.window_start, o.window_end, o.key, o.id, o.score, o.rn)).toSet
      val w = Window.partitionBy($"ws", $"key").orderBy($"score".desc, $"id")
      val want = toIn(rows.toDF())
        .withColumn("ws", $"ts_ms" - ($"ts_ms" % windowMs))
        .select($"ws", ($"ws" + windowMs).as("we"), $"key", $"id", $"score",
          row_number().over(w).as("rn"))
        .filter($"rn" <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getDouble(4), r.getInt(5))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("late row for a closed window is dropped, not re-emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WRaw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"score").as[WinRankIn]
    val q = WindowRank.windowTopN(
        toIn(input.toDF().withWatermark("ts", "1 second")), 10000L, 3)
      .writeStream.outputMode("append").format("memory").queryName("winrank_late").start()
    try {
      input.addData(raw("a", 1, 1001, 5.0)); q.processAllAvailable()
      input.addData(raw("a", 2, 1050, 1.0)); q.processAllAvailable() // closes [1000,1010)
      val afterClose = spark.table("winrank_late").count()
      assert(afterClose == 1L) // id=1 emitted with rank 1
      // id=3 targets the closed window; the watermark filter may drop it
      // upstream, and the operator's closedUpTo frontier drops it if not
      input.addData(raw("a", 3, 1002, 9.0)); q.processAllAvailable()
      input.addData(raw("z", 9, 2000, 0.0)); q.processAllAvailable()
      val rowsOut = spark.table("winrank_late").as[WinRankOut].collect()
      assert(!rowsOut.exists(_.id == 3L), "late row must not resurrect a closed window")
      assert(rowsOut.count(_.window_start == 1000000L) == 1)
    } finally q.stop()
  }

  test("streaming window dedup keep-first/keep-last equals batch rowtime rank=1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val windowMs = 10000L
    val rows = Seq( // duplicates per (window,key) at distinct rowtimes, out of order
      raw("a", 1, 1003, 5.0), raw("a", 2, 1001, 9.0), raw("a", 3, 1007, 7.0),
      raw("b", 4, 1002, 1.0), raw("b", 5, 1008, 4.0),
      raw("a", 6, 1012, 2.0), raw("a", 7, 1015, 6.0), raw("b", 8, 1011, 8.0))
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"score").as[WinRankIn]
    def run(keepFirst: Boolean, name: String): Set[(Long, String, Long)] = {
      val input = MemoryStream[WRaw]
      val q = WindowRank.windowDedup(
          toIn(input.toDF().withWatermark("ts", "2 seconds")), windowMs, keepFirst)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        input.addData(rows.take(5): _*); q.processAllAvailable()
        input.addData(rows.drop(5): _*); q.processAllAvailable()
        input.addData(raw("z", 99, 2000, 0.0)); q.processAllAvailable()
        spark.table(name).as[WinRankOut].collect()
          .filter(_.key != "z").map(o => (o.window_start, o.key, o.id)).toSet
      } finally q.stop()
    }
    def want(desc: Boolean): Set[(Long, String, Long)] = {
      val ord = if (desc) Seq($"ts_ms".desc, $"id".desc) else Seq($"ts_ms".asc, $"id".asc)
      val w = Window.partitionBy($"ws", $"key").orderBy(ord: _*)
      toIn(rows.toDF())
        .withColumn("ws", $"ts_ms" - ($"ts_ms" % windowMs))
        .select($"ws", $"key", $"id", row_number().over(w).as("rn"))
        .filter($"rn" === 1)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(run(keepFirst = true, "windedup_first") == want(desc = false))
    assert(run(keepFirst = false, "windedup_last") == want(desc = true))
  }
}
