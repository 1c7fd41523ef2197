package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.WatermarkOps
import java.sql.Timestamp

/** CURRENT_WATERMARK() analog: rows are stamped with the global
  * event-time watermark of the micro-batch that processed them, which in
  * Spark is derived at the previous batch boundary (max event time minus
  * the declared delay) — so batch N+1's rows carry the watermark earned
  * by batch N, and late rows classify against it.
  */
class WatermarkOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(idSec: Long): Ev =
    Ev(idSec, new Timestamp(idSec * 1000L), 1L, "e", 1.0)

  test("withCurrentWatermark stamps the per-batch global watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val stamped = WatermarkOps.withCurrentWatermark(
      input.toDS().withWatermark("ts", "10 seconds").as[Ev], (e: Ev) => e.user_id)
    val q = stamped.map(t => (t._1.event_id, t._2))
      .writeStream.format("memory").queryName("wm_sink").outputMode("append").start()
    try {
      input.addData(ev(100)); q.processAllAvailable()   // wm for next batch: 90 s
      input.addData(ev(200)); q.processAllAvailable()   // wm for next batch: 190 s
      input.addData(ev(205), ev(50)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wm_sink").as[(Long, Long)].collect().toMap
    assert(got(100L) == 0L)        // first batch: no watermark earned yet
    assert(got(200L) == 90000L)    // batch 2 sees batch 1's 100s - 10s
    assert(got(205L) == 190000L && got(50L) == 190000L)
  }

  test("tagLate classifies rows behind the observed watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val tagged = WatermarkOps.tagLate(
      input.toDS().withWatermark("ts", "10 seconds").as[Ev],
      (e: Ev) => e.user_id, (e: Ev) => e.ts.getTime)
    val q = tagged.map(t => (t._1.event_id, t._3))
      .writeStream.format("memory").queryName("late_sink").outputMode("append").start()
    try {
      input.addData(ev(100)); q.processAllAvailable()
      input.addData(ev(200), ev(30)); q.processAllAvailable() // wm 90 s: 30 is late
    } finally q.stop()
    val got = spark.table("late_sink").as[(Long, Boolean)].collect().toMap
    assert(!got(200L) && got(30L))
  }
}
