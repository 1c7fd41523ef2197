package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CumulateOps, CumulateOut, OverIn}

/** Streaming CUMULATE vs the batch Cumulate.assign oracle: per-step
  * append emissions over out-of-order multi-batch input must equal the
  * batch expanding-window aggregation for every closed step, with spans
  * evicted after their last step.
  */
class StreamingCumulateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming cumulate emits each closed step once, equal to the batch assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 2-min steps in a 10-min span; span boundaries at :00/:10/...
    val rows = Seq(
      Raw(1, 1, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1.0),
      Raw(1, 2, java.sql.Timestamp.valueOf("2024-01-01 10:03:30"), 2.0),
      Raw(1, 3, java.sql.Timestamp.valueOf("2024-01-01 10:02:10"), 3.0), // out of order
      Raw(1, 4, java.sql.Timestamp.valueOf("2024-01-01 10:09:59"), 4.0), // last step only
      Raw(2, 5, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 10.0),
      Raw(1, 6, java.sql.Timestamp.valueOf("2024-01-01 10:11:00"), 6.0)) // next span
    val input = MemoryStream[Raw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key".cast("string").as("key"), $"id", unix_millis($"ts").as("ts_ms"), array($"value").as("values"),
        array(lit(false)).as("nulls"),
        expr("CAST(array() AS ARRAY<STRING>)").as("svalues")).as[OverIn]
    val q = CumulateOps.cumulate(
        toIn(input.toDF().withWatermark("ts", "5 seconds")), 120000L, 600000L)
      .writeStream.outputMode("append").format("memory").queryName("cum_out").start()
    try {
      input.addData(rows.take(3): _*); q.processAllAvailable()
      input.addData(rows.drop(3): _*); q.processAllAvailable()
      input.addData(Raw(9, 99, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("cum_out").as[CumulateOut].collect()
        .filter(_.key != "9")
        .map(o => (o.key, o.window_start, o.window_end, o.sum_value, o.n))
      // append semantics: every (key, window) emitted exactly once
      assert(got.map(t => (t._1, t._2, t._3)).distinct.length == got.length)
      val want = graft.operators.Cumulate
        .assign(rows.toDF().filter($"key" =!= 9), "ts", 600000L, 120000L)
        .groupBy($"key", unix_millis($"w_start").as("ws"), unix_millis($"w_end").as("we"))
        .agg(sum($"value").as("s"), count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      assert(got.toSet == want.toSet, s"got ${got.toSet}\nwant ${want.toSet}")
    } finally q.stop()
  }
}
