package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{TemporalIn, TemporalJoin, TemporalMatch}

/** Streaming temporal as-of join: versioned MapState + watermark-driven
  * probe resolution, including out-of-order versions arriving after the
  * probe.
  */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def in(key: Long, side: Int, id: Long, sec: Long, v: Double) =
    Raw(key, side.toLong * 1000000 + id, new java.sql.Timestamp(sec * 1000), v)

  test("as-of join resolves probes against the latest version at-or-before") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    // Raw.id encodes side: side = id / 1000000
    val tagged = input.toDS()
      .withWatermark("ts", "5 seconds")
      .select($"key", expr("id div 1000000").cast("int").as("side"),
        ($"id" % 1000000).as("id"), unix_millis($"ts").as("ts_ms"), $"value")
      .as[TemporalIn]
    val q = TemporalJoin.asOf(tagged)
      .writeStream.outputMode("append").format("memory").queryName("tj_out").start()
    try {
      // versions for key 1 at t=1000 (v=1.0) and t=1100 (v=2.0)
      // probes at t=1050 (→ version@1000), t=1200 (→ version@1100),
      //           t=900  (→ no version)
      input.addData(
        in(1, 0, 10, 1000, 1.0), in(1, 0, 11, 1100, 2.0),
        in(1, 1, 20, 1050, 0.0), in(1, 1, 21, 1200, 0.0), in(1, 1, 22, 900, 0.0))
      q.processAllAvailable()
      // push the watermark far past every probe
      input.addData(in(9, 0, 99, 5000, 0.0))
      q.processAllAvailable()
      val got = spark.table("tj_out").as[TemporalMatch].collect().toSet
      assert(got == Set(
        TemporalMatch(1, 20, 1050000, Some(10), Some(1.0)),
        TemporalMatch(1, 21, 1200000, Some(11), Some(2.0)),
        TemporalMatch(1, 22, 900000, None, None)))
    } finally q.stop()
  }

  test("out-of-order version arriving before the watermark closes still wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    val tagged = input.toDS()
      .withWatermark("ts", "60 seconds")
      .select($"key", expr("id div 1000000").cast("int").as("side"),
        ($"id" % 1000000).as("id"), unix_millis($"ts").as("ts_ms"), $"value")
      .as[TemporalIn]
    val q = TemporalJoin.asOf(tagged)
      .writeStream.outputMode("append").format("memory").queryName("tj_out2").start()
    try {
      // probe first...
      input.addData(in(1, 1, 20, 1050, 0.0))
      q.processAllAvailable()
      // ...then a LATE version older than the probe (within watermark slack)
      input.addData(in(1, 0, 10, 1040, 7.0))
      q.processAllAvailable()
      // close the watermark
      input.addData(in(9, 0, 99, 5000, 0.0))
      q.processAllAvailable()
      val got = spark.table("tj_out2").as[TemporalMatch].collect().toSet
      assert(got == Set(TemporalMatch(1, 20, 1050000, Some(10), Some(7.0))))
    } finally q.stop()
  }
}
