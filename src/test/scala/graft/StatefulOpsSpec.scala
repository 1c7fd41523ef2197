package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming._

/** The transformWithState-backed custom operators (KeyedProcess façade):
  * streaming Top-N, count windows, keep-last dedup. Changelog outputs are
  * asserted by NET effect (entries are unique, re-entry impossible), so
  * batch-internal emission order doesn't matter.
  */
class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var qid = 0
  private def nextName(): String = { qid += 1; s"stateful_out_$qid" }

  test("streaming top-n changelog nets to the batch top-n per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 60).map(i => KeyedScored(s"g${i % 3}", i.toLong, (i * 37 % 100).toDouble))
    val input = MemoryStream[KeyedScored]
    val name = nextName()
    val q = StatefulOps.topN(input.toDS(), 5)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // three micro-batches, deliberately interleaved
      input.addData(data.take(20): _*); q.processAllAvailable()
      input.addData(data.slice(20, 40): _*); q.processAllAvailable()
      input.addData(data.drop(40): _*); q.processAllAvailable()
      val changes = spark.table(name).as[TopNChange].collect()
      val net = changes.groupBy(c => (c.key, c.id, c.score)).collect {
        case (k, cs) if cs.count(_.row_kind == "+I") - cs.count(_.row_kind == "-D") == 1 => k
      }.toSet
      val want = data.groupBy(_.key).flatMap { case (k, xs) =>
        xs.sortBy(e => (-e.score, e.id)).take(5).map(e => (k, e.id, e.score))
      }.toSet
      assert(net == want)
    } finally q.stop()
  }

  test("count window emits one aggregate per `size` rows per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val name = nextName()
    val q = StatefulOps.countWindow(input.toDS(), 3)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // key 1: 7 rows → 2 full windows (+1 partial, unemitted); key 2: 3 rows → 1
      input.addData((1 to 5).map(i => KeyedValue(1L, i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
      input.addData(KeyedValue(1L, 6, 6.0), KeyedValue(1L, 7, 7.0),
        KeyedValue(2L, 8, 1.0), KeyedValue(2L, 9, 2.0), KeyedValue(2L, 10, 3.0))
      q.processAllAvailable()
      val got = spark.table(name).as[CountWindowOut].collect()
        .map(o => (o.key, o.win_seq, o.n, o.sum_value)).toSet
      assert(got == Set((1L, 0L, 3L, 6.0), (1L, 1L, 3L, 15.0), (2L, 0L, 3L, 6.0)))
    } finally q.stop()
  }

  test("retract changelog end-to-end: materialize(keep-last emissions) == batch keep-last") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val name = nextName()
    val q = StatefulOps.keepLast(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      val data = Seq(KeyedValue(1, 1, 10), KeyedValue(2, 2, 20), KeyedValue(1, 3, 30),
        KeyedValue(3, 4, 40), KeyedValue(1, 5, 50), KeyedValue(2, 6, 60))
      input.addData(data.take(3): _*); q.processAllAvailable()
      input.addData(data.drop(3): _*); q.processAllAvailable()
      // the memory sink preserves emission order per batch; tag a seq
      val log = spark.table(name).as[KeepLastOut].collect().zipWithIndex
        .map { case (o, i) => (o.row_kind, o.key, o.id, o.value, i.toLong) }
        .toSeq.toDF("row_kind", "key", "id", "value", "seq")
      val cur = graft.operators.Changelog.materialize(log, Seq("key"), "seq")
        .select($"key", $"id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cur == Map(1L -> 5L, 2L -> 6L, 3L -> 4L))
    } finally q.stop()
  }

  test("keep-last dedup changelog nets to the last row per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val name = nextName()
    val q = StatefulOps.keepLast(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(KeyedValue(1L, 1, 10.0), KeyedValue(2L, 2, 20.0))
      q.processAllAvailable()
      input.addData(KeyedValue(1L, 3, 30.0)) // replaces id=1 for key 1
      q.processAllAvailable()
      val changes = spark.table(name).as[KeepLastOut].collect()
      val net = changes.groupBy(c => (c.key, c.id, c.value)).collect {
        case (k, cs) if cs.count(_.row_kind == "+U") - cs.count(_.row_kind == "-U") == 1 => k
      }.toSet
      assert(net == Set((1L, 3L, 30.0), (2L, 2L, 20.0)))
      // and the retraction for the replaced row was emitted
      assert(changes.exists(c => c.row_kind == "-U" && c.id == 1L))
    } finally q.stop()
  }

  test("top-n upserts a re-arriving id: old version retracted, never two versions ranked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedScored]
    val name = nextName()
    val q = StatefulOps.topN(input.toDS(), 3)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(KeyedScored("g", 1, 50.0), KeyedScored("g", 2, 40.0))
      q.processAllAvailable()
      input.addData(KeyedScored("g", 1, 90.0)) // id 1 re-arrives with a new score
      q.processAllAvailable()
      val changes = spark.table(name).as[TopNChange].collect()
      // net state per (id, score): +I minus -D
      val net = changes.groupBy(c => (c.id, c.score)).collect {
        case (k, cs) if cs.count(_.row_kind == "+I") - cs.count(_.row_kind == "-D") == 1 => k
      }.toSet
      assert(net == Set((1L, 90.0), (2L, 40.0)), s"got $net")
      // the old version of id 1 was explicitly retracted
      assert(changes.exists(c => c.row_kind == "-D" && c.id == 1L && c.score == 50.0))
    } finally q.stop()
  }

  test("state TTL: an expired key re-arrival emits no retraction (Flink StateTtlConfig analog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // processing-time state (TimeMode.ProcessingTime) schedules no-data
    // micro-batches continuously, which keeps processAllAvailable from
    // ever settling — disable them for this query (TTL expiry is checked
    // on state READ, not by background batches, so semantics are intact)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val input = MemoryStream[KeyedValue]
    val name = nextName()
    val q = StatefulOps.keepLast(input.toDS(),
        ttl = org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofSeconds(5)))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(KeyedValue(1L, 1, 10.0))
      q.processAllAvailable()
      Thread.sleep(8000) // processing-time TTL elapses
      // one batch carries both post-expiry rows: the expired read (no -U
      // for id 1) and the live refinement (-U for id 2) share a batch
      // timestamp, so the live check can never be starved past the TTL
      // by a slow machine
      input.addData(KeyedValue(1L, 2, 20.0), KeyedValue(1L, 3, 30.0))
      q.processAllAvailable()
      val changes = spark.table(name).as[KeepLastOut].collect()
      assert(!changes.exists(c => c.row_kind == "-U" && c.id == 1L),
        "expired state must read as absent - no retraction of the pre-TTL row")
      assert(changes.exists(c => c.row_kind == "-U" && c.id == 2L),
        "live state still retracts normally")
      assert(changes.count(_.row_kind == "+U") == 3)
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    }
  }
}
