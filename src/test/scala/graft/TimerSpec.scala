package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{GapSession, TimedValue, TimerOps}

/** Event-time timers through the KeyedProcess façade: sessions close when
  * the watermark passes last_ts + gap (cross-batch), or inline when the
  * gap is exceeded within a batch.
  */
class TimerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def raw(key: Long, id: Long, sec: Long, v: Double) =
    Raw(key, id, new java.sql.Timestamp(sec * 1000), v)

  test("event-time timer closes gap sessions when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    val timed = input.toDS()
      .withWatermark("ts", "5 seconds")
      .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"value")
      .as[TimedValue]
    val q = TimerOps.gapSessions(timed, gapMs = 30000L)
      .writeStream.outputMode("append").format("memory").queryName("timer_out").start()
    try {
      // key 1: events at 1000s and 1010s (one session)
      input.addData(raw(1, 1, 1000, 1.0), raw(1, 2, 1010, 2.0))
      q.processAllAvailable()
      assert(spark.table("timer_out").count() == 0) // watermark hasn't passed 1010+30
      // watermark pusher: far-future event on another key fires key 1's timer
      input.addData(raw(2, 99, 2000, 9.0))
      q.processAllAvailable()
      val got = spark.table("timer_out").as[GapSession].collect().toSet
      assert(got == Set(GapSession(1, 2, 3.0, 1000000, 1010000)))
    } finally q.stop()
  }

  test("inline close: gap exceeded within one batch emits the earlier session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    val timed = input.toDS()
      .withWatermark("ts", "5 seconds")
      .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"value")
      .as[TimedValue]
    val q = TimerOps.gapSessions(timed, gapMs = 30000L)
      .writeStream.outputMode("append").format("memory").queryName("timer_out2").start()
    try {
      // one batch, two bursts 100s apart → first session emitted inline
      input.addData(raw(1, 1, 1000, 1.0), raw(1, 2, 1005, 1.0),
        raw(1, 3, 1200, 5.0))
      q.processAllAvailable()
      val got = spark.table("timer_out2").as[GapSession].collect().toSet
      assert(got.contains(GapSession(1, 2, 2.0, 1000000, 1005000)))
    } finally q.stop()
  }

  test("out-of-order event within the watermark slack joins the correct session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    val timed = input.toDS()
      .withWatermark("ts", "60 seconds")
      .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"value")
      .as[TimedValue]
    val q = TimerOps.gapSessions(timed, gapMs = 30000L)
      .writeStream.outputMode("append").format("memory").queryName("timer_out3").start()
    try {
      // arrival order: 1000s, 1020s ... then 1010s arrives LATE (within
      // the 60s slack) — it must still land inside the same session, and
      // the session must fold in event-time order
      input.addData(raw(1, 1, 1000, 1.0), raw(1, 3, 1020, 4.0))
      q.processAllAvailable()
      input.addData(raw(1, 2, 1010, 2.0))
      q.processAllAvailable()
      input.addData(raw(2, 99, 3000, 0.0)) // advance the watermark far past
      q.processAllAvailable()
      val got = spark.table("timer_out3").as[GapSession].collect().toSet
      assert(got.contains(GapSession(1, 3, 7.0, 1000000, 1020000)),
        s"late event must merge into its event-time session; got $got")
    } finally q.stop()
  }
}
