package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SemiAntiJoin, SemiAntiOut, TemporalIn}

/** Streaming semi/anti join semantics: match-before, match-after (within
  * bound), and anti emission on watermark timeout.
  */
class SemiAntiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def in(key: Long, side: Int, id: Long, sec: Long) =
    Raw(key, side.toLong * 1000000 + id, new java.sql.Timestamp(sec * 1000), 0.0)

  test("semi emits on existing or late-arriving match; anti fires on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    val tagged = input.toDS()
      .withWatermark("ts", "5 seconds")
      .select($"key", expr("id div 1000000").cast("int").as("side"),
        ($"id" % 1000000).as("id"), unix_millis($"ts").as("ts_ms"), $"value")
      .as[TemporalIn]
    val q = SemiAntiJoin.within(tagged, boundMs = 30000L)
      .writeStream.outputMode("append").format("memory").queryName("sa_out").start()
    try {
      // key 1: right@1000 then left@1020 → semi immediately (match-before)
      // key 2: left@1000, right@1025 arrives later within 30s → semi on arrival
      // key 3: left@1000, no right → anti once watermark passes 1030
      input.addData(in(1, 0, 10, 1000), in(1, 1, 20, 1020), in(2, 1, 21, 1000))
      q.processAllAvailable()
      input.addData(in(2, 0, 11, 1025), in(3, 1, 22, 1000))
      q.processAllAvailable()
      input.addData(in(9, 0, 99, 5000)) // advance watermark, fire timers
      q.processAllAvailable()
      val got = spark.table("sa_out").as[SemiAntiOut].collect()
        .filter(_.key != 9)
        .map(o => (o.key, o.id, o.matched)).toSet
      assert(got == Set((1L, 20L, true), (2L, 21L, true), (3L, 22L, false)))
    } finally q.stop()
  }

  test("lefts within boundMs of epoch are not dropped at stream start") {
    // regression: the late-row guard's frontier must start at
    // Long.MinValue — get() on unset ValueState[Long] null-unboxes to 0,
    // which silently dropped every left with ts_ms <= boundMs
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Raw]
    val tagged = input.toDS()
      .withWatermark("ts", "5 seconds")
      .select($"key", expr("id div 1000000").cast("int").as("side"),
        ($"id" % 1000000).as("id"), unix_millis($"ts").as("ts_ms"), $"value")
      .as[graft.streaming.TemporalIn]
    val q = SemiAntiJoin.within(tagged, boundMs = 30000L)
      .writeStream.outputMode("append").format("memory").queryName("sa_epoch").start()
    try {
      // key 1: right@10s, left@5s (5s − 30s bound < 0) → SEMI
      // key 2: left@8s, no right → ANTI once watermark passes 38s
      input.addData(in(1, 0, 10, 10), in(1, 1, 20, 5), in(2, 1, 21, 8))
      q.processAllAvailable()
      input.addData(in(9, 0, 99, 60)) // advance watermark, fire timers
      q.processAllAvailable()
      val got = spark.table("sa_epoch").as[SemiAntiOut].collect()
        .filter(_.key != 9)
        .map(o => (o.key, o.id, o.matched)).toSet
      assert(got == Set((1L, 20L, true), (2L, 21L, false)))
    } finally q.stop()
  }
}
