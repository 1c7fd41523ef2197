package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EarlyFire, Triggers}
import graft.operators.AsyncLookup
import scala.concurrent.Future
import scala.concurrent.duration._

object LookupCounter {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Early-firing trigger analog + cached async lookup. */
class TriggersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("early-firing tumble emits partials at early boundaries, final purging row at close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val tuples = input.toDF().withWatermark("ts", "5 seconds")
      .select($"event_type", unix_millis($"ts"), $"value")
      .as[(String, Long, Double)]
    // 60s windows, early fire every 20s
    val q = Triggers.earlyFiringTumble(tuples, sizeMs = 60000L, earlyMs = 20000L)
      .writeStream.outputMode("append").format("memory").queryName("early_out").start()
    def ev(id: Long, sec: Long, v: Double) =
      Ev(id, new java.sql.Timestamp(sec * 1000), 1, "k", v)
    try {
      // window [960, 1020): events at 965 and 975
      input.addData(ev(1, 965, 1.0), ev(2, 975, 2.0))
      q.processAllAvailable()
      // advance watermark past the first early boundary (980) but not the
      // window end: partial firing with both rows
      input.addData(ev(3, 990, 4.0)) // same window, also pushes wm to 985
      q.processAllAvailable()
      val partial = spark.table("early_out").as[EarlyFire].collect()
      // the partial reflects window state at firing time (elements of the
      // firing batch are folded in before the timer runs)
      assert(partial.exists(f => !f.is_final && f.w_start == 960000L && f.n >= 2),
        s"expected an early partial; got ${partial.toSeq}")
      assert(!partial.exists(_.is_final))
      // close the window
      input.addData(ev(99, 2000, 0.0))
      q.processAllAvailable()
      val all = spark.table("early_out").as[EarlyFire].collect()
      val fin = all.filter(f => f.is_final && f.w_start == 960000L)
      assert(fin.length == 1 && fin.head.n == 3 && fin.head.sum_value == 7.0 &&
        fin.head.w_end == 1020000L)
      // a LATE row for the closed window must not re-open it (no second
      // final, no new partials for that window)
      input.addData(ev(100, 970, 9.0))
      q.processAllAvailable()
      val after = spark.table("early_out").as[EarlyFire].collect()
      assert(after.count(f => f.is_final && f.w_start == 960000L) == 1,
        s"late row re-opened the window: ${after.toSeq}")
      assert(after.length == all.length, s"late row emitted rows: ${after.toSeq}")
    } finally q.stop()
  }

  test("count and time evictors trim the window buffer before aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{CountEvictor, EvictedWindow, Evictors, TimeEvictor, TimedValue}
    def run(ev: graft.streaming.Evictor, name: String): Seq[EvictedWindow] = {
      val input = MemoryStream[Raw]
      val timed = input.toDS().withWatermark("ts", "5 seconds")
        .select($"key", $"id", unix_millis($"ts").as("ts_ms"), $"value")
        .as[TimedValue]
      val q = Evictors.evictedTumble(timed, sizeMs = 60000L, ev)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      def raw(id: Long, sec: Long, v: Double) = Raw(1L, id, new java.sql.Timestamp(sec * 1000), v)
      try {
        // window [960s, 1020s): 4 events at 965/970/990/1015
        input.addData(raw(1, 965, 1.0), raw(2, 970, 2.0))
        q.processAllAvailable()
        input.addData(raw(3, 990, 4.0), raw(4, 1015, 8.0))
        q.processAllAvailable()
        input.addData(Raw(9L, 99, new java.sql.Timestamp(2000 * 1000), 0.0)) // close
        q.processAllAvailable()
        spark.table(name).as[EvictedWindow].collect().toSeq.filter(_.key == 1L)
      } finally q.stop()
    }
    // CountEvictor(2): keep the LAST two (990, 1015)
    val c = run(CountEvictor(2), "evict_c")
    assert(c == Seq(EvictedWindow(1, 960000, 1020000, 2, 12.0, 2)))
    // TimeEvictor(30s): keep events within 30s of the window max (1015)
    val t = run(TimeEvictor(30000), "evict_t")
    assert(t == Seq(EvictedWindow(1, 960000, 1020000, 2, 12.0, 2)))
  }

  test("cached async lookup: hits skip the fetch, results stay ordered and correct") {
    import spark.implicits._
    LookupCounter.calls.set(0)
    val keys = Seq(1, 2, 1, 1, 2, 3, 3, 1, 2, 3, 1, 1)
    val ds = keys.toDS().repartition(1)
    val out = AsyncLookup.mapCached(ds, capacity = 2, timeout = 10.seconds,
        cacheMax = 100, cacheTtlMs = 60000L)(identity) { (k, ec) =>
      Future { LookupCounter.calls.incrementAndGet(); s"dim-$k" }(ec)
    }((i, v) => (i, v))
    val got = out.collect().toSeq
    assert(got == keys.map(k => (k, s"dim-$k")))
    val calls = LookupCounter.calls.get()
    assert(calls >= 3, "every distinct key fetched at least once")
    assert(calls <= 6, s"cache must absorb most repeats; got $calls fetches for ${keys.size} rows")
  }
}
