package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming._

/** Retract-emitting streaming group aggregate (Flink GroupAggFunction
  * semantics): exact changelog trace, materialize==batch equivalence, and
  * consuming an upstream retract stream.
  */
class GroupAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var qid = 0
  private def nextName(): String = { qid += 1; s"groupagg_out_$qid" }

  test("changelog trace matches Flink's documented +I/-U/+U/-D sequence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeIn]
    val name = nextName()
    val q = GroupAgg.retractingAgg(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // single key so the memory sink's per-batch order IS the trace
      input.addData(ChangeIn("+I", 1, 10.0)); q.processAllAvailable()
      input.addData(ChangeIn("+I", 1, 20.0)); q.processAllAvailable()
      input.addData(ChangeIn("-U", 1, 10.0)); q.processAllAvailable()
      input.addData(ChangeIn("-D", 1, 20.0)); q.processAllAvailable()
      val trace = spark.table(name).as[GroupAggChange].collect()
        .map(c => (c.row_kind, c.cnt, c.sum_value)).toList
      assert(trace == List(
        ("+I", 1L, 10.0),                      // first row of the group
        ("-U", 1L, 10.0), ("+U", 2L, 30.0),    // refinement pair
        ("-U", 2L, 30.0), ("+U", 1L, 20.0),    // retraction refines too
        ("-D", 1L, 20.0)))                     // count hits zero: delete
    } finally q.stop()
  }

  test("aggregate-value-unchanged input emits nothing (equaliser)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeIn]
    val name = nextName()
    val q = GroupAgg.retractingAgg(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(ChangeIn("+I", 7, 5.0)); q.processAllAvailable()
      // +1 row of 0.0 changes cnt → emits; then -U of 0.0 restores → emits;
      // a (+I 0.0, -U 0.0) net-zero pair in ONE batch still emits all four
      // intermediate refinements (per-record semantics like Flink)
      input.addData(ChangeIn("+I", 7, 0.0), ChangeIn("-U", 7, 0.0))
      q.processAllAvailable()
      val trace = spark.table(name).as[GroupAggChange].collect()
        .map(c => (c.row_kind, c.cnt, c.sum_value)).toList
      assert(trace == List(
        ("+I", 1L, 5.0),
        ("-U", 1L, 5.0), ("+U", 2L, 5.0),
        ("-U", 2L, 5.0), ("+U", 1L, 5.0)))
    } finally q.stop()
  }

  test("materialize(retract stream) == batch group aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (1 to 90).map(i => ChangeIn("+I", (i % 7).toLong, (i * 13 % 50).toDouble))
    val input = MemoryStream[ChangeIn]
    val name = nextName()
    val q = GroupAgg.retractingAgg(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(data.take(40): _*); q.processAllAvailable()
      input.addData(data.slice(40, 70): _*); q.processAllAvailable()
      input.addData(data.drop(70): _*); q.processAllAvailable()
      val log = spark.table(name).as[GroupAggChange].collect().zipWithIndex
        .map { case (c, i) => (c.row_kind, c.key, c.cnt, c.sum_value, c.avg_value, i.toLong) }
        .toSeq.toDF("row_kind", "key", "cnt", "sum_value", "avg_value", "seq")
      val got = graft.operators.Changelog.materialize(log, Seq("key"), "seq")
        .select($"key", $"cnt", $"sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = data.groupBy(_.key).map { case (k, xs) =>
        (k, xs.size.toLong, xs.map(_.value).sum)
      }.toSet
      assert(got == want)
    } finally q.stop()
  }

  test("consumes an upstream retract stream: agg over keep-last dedup == batch latest-per-key agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // upstream: keep-last dedup per sensor id emits -U/+U; downstream:
    // retracting SUM of the LATEST value per sensor, grouped sensor%2
    val data = Seq(
      KeyedValue(1, 0, 10.0), KeyedValue(2, 0, 20.0), KeyedValue(3, 0, 30.0),
      KeyedValue(1, 0, 11.0), KeyedValue(4, 0, 40.0), KeyedValue(2, 0, 22.0),
      KeyedValue(1, 0, 12.0), KeyedValue(3, 0, 33.0))
    val input = MemoryStream[KeyedValue]
    val name = nextName()
    val dedup = StatefulOps.keepLast(input.toDS())
    val agg = GroupAgg.retractingAgg(
      dedup.map(o => ChangeIn(o.row_kind, o.key % 2, o.value)))
    val q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(data.take(5): _*); q.processAllAvailable()
      input.addData(data.drop(5): _*); q.processAllAvailable()
      val log = spark.table(name).as[GroupAggChange].collect().zipWithIndex
        .map { case (c, i) => (c.row_kind, c.key, c.cnt, c.sum_value, c.avg_value, i.toLong) }
        .toSeq.toDF("row_kind", "key", "cnt", "sum_value", "avg_value", "seq")
      val got = graft.operators.Changelog.materialize(log, Seq("key"), "seq")
        .select($"key", $"cnt", $"sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch oracle: latest value per sensor, summed per sensor%2
      val latest = data.zipWithIndex.groupBy(_._1.key)
        .map { case (k, xs) => k -> xs.maxBy(_._2)._1.value }
      val want = latest.groupBy { case (k, _) => k % 2 }.map { case (g, m) =>
        (g, m.size.toLong, m.values.sum)
      }.toSet
      assert(got == want)
    } finally q.stop()
  }

  test("three-operator chain: keep-last -> group agg -> retractable Top-N nets to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the full canonical Flink pipeline (dedup -> agg -> rank), one
    // streaming query, the row_kind changelog threaded through all
    // three stateful operators
    val data = Seq(
      KeyedValue(1, 0, 10.0), KeyedValue(2, 0, 20.0), KeyedValue(3, 0, 30.0),
      KeyedValue(1, 0, 11.0), KeyedValue(4, 0, 40.0), KeyedValue(2, 0, 22.0),
      KeyedValue(1, 0, 12.0), KeyedValue(3, 0, 33.0))
    val input = MemoryStream[KeyedValue]
    val name = nextName()
    val dedup = StatefulOps.keepLast(input.toDS())
    val agg = GroupAgg.retractingAgg(
      dedup.map(o => ChangeIn(o.row_kind, o.key % 2, o.value)))
    val top = ChangelogChain.retractableTopN(
      agg.map(c => ChangeScored(c.row_kind, "all", c.key, c.sum_value)), 1)
    val q = top.writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(data.take(5): _*); q.processAllAvailable()
      input.addData(data.drop(5): _*); q.processAllAvailable()
      val net = scala.collection.mutable.LinkedHashMap[Long, Double]()
      spark.table(name).as[TopNChange].collect().foreach { c =>
        if (c.row_kind == "+I") net(c.id) = c.score else net.remove(c.id)
      }
      // batch: latest per sensor {1:12, 2:22, 3:33, 4:40}; group sums
      // {g1: 45, g0: 62}; top-1 group is 0 at 62
      assert(net.toMap == Map(0L -> 62.0), s"netted $net")
    } finally q.stop()
  }

  test("retract-consuming window agg: -U cancels its insert from the row's window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, java.sql.Timestamp, Double)]
    val name = nextName()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val q = ChangelogChain.retractWindowAgg(
        input.toDF().toDF("row_kind", "key", "ts", "value")
          .withWatermark("ts", "5 seconds")
          .select($"row_kind", $"key", unix_millis($"ts").as("ts_ms"), $"value")
          .as[WinChangeIn], 60000L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // window [0, 60s): a keeps 20 after a retraction; b nets to zero;
      // window [60s, 120s): a gets 5
      input.addData(
        ("+I", "a", t(1), 10.0), ("+I", "a", t(2), 20.0), ("-U", "a", t(3), 10.0),
        ("+I", "b", t(4), 7.0), ("-U", "b", t(5), 7.0),
        ("+I", "a", t(61), 5.0))
      q.processAllAvailable()
      input.addData(("+I", "z", t(200), 0.0)) // advance watermark past both
      q.processAllAvailable()
      // late changelog row for the closed window must drop silently
      input.addData(("-U", "a", t(3), 20.0))
      q.processAllAvailable()
      input.addData(("+I", "z", t(400), 0.0)) // close z's window too
      q.processAllAvailable()
      val got = spark.table(name).as[WinAggOut].collect()
        .map(o => (o.window_start, o.key, o.cnt, o.sum_value)).toSet
      assert(got == Set(
        (0L, "a", 1L, 20.0),       // retraction cancelled the 10.0 insert
        (60000L, "a", 1L, 5.0),
        (180000L, "z", 1L, 0.0)),  // b's net-zero window emitted nothing
        s"got $got")
    } finally q.stop()
  }

  test("changelog chain: group agg feeds retractable Top-N in ONE query; nets to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeIn]
    val name = nextName()
    val q = ChangelogChain.aggTopN(input.toDS(), 2)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(ChangeIn("+I", 1, 10.0), ChangeIn("+I", 2, 25.0))
      q.processAllAvailable()
      input.addData(ChangeIn("+I", 1, 20.0), ChangeIn("+I", 3, 40.0))
      q.processAllAvailable()
      // retracting key 1's 20.0 row demotes it out of the top-2: the
      // rank operator must PROMOTE key 2 back in — the move the
      // append-only StreamingTopN cannot make, and the reason the
      // retractable rank keeps full state
      input.addData(ChangeIn("-U", 1, 20.0))
      q.processAllAvailable()
      val net = scala.collection.mutable.LinkedHashMap[Long, Double]()
      spark.table(name).as[TopNChange].collect().foreach { c =>
        if (c.row_kind == "+I") net(c.id) = c.score else net.remove(c.id)
      }
      // batch answer: sums are k1=10, k2=25, k3=40 → top-2 {3:40, 2:25}
      assert(net.toMap == Map(3L -> 40.0, 2L -> 25.0), s"netted $net")
    } finally q.stop()
  }
}
