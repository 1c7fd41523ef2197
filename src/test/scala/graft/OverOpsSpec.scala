package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BoundedOverOut, OverIn, OverOps, OverOut}

/** Streaming OVER window vs the batch Window oracle: out-of-order input
  * across micro-batches must emit the same running aggregates as
  * `SUM/COUNT OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
  * PRECEDING)` in batch.
  */
class OverOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming running agg equals batch OVER window on shuffled input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      // key 1, deliberately out of order within each batch
      Raw(1, 3, new java.sql.Timestamp(1030 * 1000), 3.0),
      Raw(1, 1, new java.sql.Timestamp(1010 * 1000), 1.0),
      Raw(1, 2, new java.sql.Timestamp(1020 * 1000), 2.0),
      Raw(2, 4, new java.sql.Timestamp(1015 * 1000), 10.0),
      // second batch, still older than the final sentinel
      Raw(1, 5, new java.sql.Timestamp(1060 * 1000), 5.0),
      Raw(2, 6, new java.sql.Timestamp(1040 * 1000), 20.0))
    val input = MemoryStream[Raw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key".cast("string").as("key"), $"id", unix_millis($"ts").as("ts_ms"), array($"value").as("values"),
        array(lit(false)).as("nulls"),
        expr("CAST(array() AS ARRAY<STRING>)").as("svalues")).as[OverIn]
    val q = OverOps.runningAgg(toIn(input.toDF().withWatermark("ts", "5 seconds")))
      .writeStream.outputMode("append").format("memory").queryName("over_out").start()
    try {
      input.addData(rows.take(4): _*); q.processAllAvailable()
      input.addData(rows.drop(4): _*); q.processAllAvailable()
      input.addData(Raw(9, 99, new java.sql.Timestamp(9000 * 1000), 0.0)) // close
      q.processAllAvailable()
      val got = spark.table("over_out").as[OverOut].collect()
        .filter(_.key != "9")
        .map(o => (o.key, o.id, o.running_sum.head, o.running_cnt, o.rn)).toSet
      val w = Window.partitionBy($"key").orderBy($"ts_ms", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = toIn(rows.toDF())
        .select($"key", $"id", sum(element_at($"values", lit(1))).over(w).as("s"),
          count(lit(1)).over(w).as("c"), row_number().over(
            Window.partitionBy($"key").orderBy($"ts_ms", $"id")).as("rn"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getInt(4).toLong)).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming bounded-range agg equals the batch RANGE INTERVAL PRECEDING frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 120 s trailing range; includes an exact-boundary pair (1100/1220:
    // 1100 >= 1220-120 → included) and equal-rowtime peers (ids 5/6)
    val rows = Seq(
      Raw(1, 1, new java.sql.Timestamp(1100 * 1000), 1.0),
      Raw(1, 2, new java.sql.Timestamp(1220 * 1000), 2.0),
      Raw(1, 3, new java.sql.Timestamp(1260 * 1000), 3.0),
      Raw(1, 4, new java.sql.Timestamp(1400 * 1000), 4.0),
      Raw(1, 5, new java.sql.Timestamp(1500 * 1000), 5.0),
      Raw(1, 6, new java.sql.Timestamp(1500 * 1000), 6.0),
      Raw(2, 7, new java.sql.Timestamp(1250 * 1000), 10.0))
    val input = MemoryStream[Raw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key".cast("string").as("key"), $"id", unix_millis($"ts").as("ts_ms"), array($"value").as("values"),
        array(lit(false)).as("nulls"),
        expr("CAST(array() AS ARRAY<STRING>)").as("svalues")).as[OverIn]
    val q = OverOps.boundedRangeAgg(
        toIn(input.toDF().withWatermark("ts", "5 seconds")), 120000L)
      .writeStream.outputMode("append").format("memory").queryName("bover_out").start()
    try {
      input.addData(rows.take(3): _*); q.processAllAvailable()
      input.addData(rows.drop(3): _*); q.processAllAvailable()
      input.addData(Raw(9, 99, new java.sql.Timestamp(9000 * 1000), 0.0)) // close
      q.processAllAvailable()
      val got = spark.table("bover_out").as[BoundedOverOut].collect()
        .filter(_.key != "9")
        .map(o => (o.key, o.id, o.range_sum.head, o.range_cnt)).toSet
      // batch oracle: the same frame via SQL RANGE BETWEEN INTERVAL
      rows.toDF().createOrReplaceTempView("bover_batch")
      val want = spark.sql(
        """SELECT key, id,
          |  sum(value) OVER w AS s, count(*) OVER w AS c
          |FROM bover_batch
          |WINDOW w AS (PARTITION BY key ORDER BY ts
          |             RANGE BETWEEN INTERVAL '2' MINUTE PRECEDING AND CURRENT ROW)""".stripMargin)
        .collect().map(r => (r.getLong(0).toString, r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got == want)
      // spot-pin the peer frame: ids 5 and 6 share {4, 5, 6} → sum 15
      assert(got.contains(("1", 5L, 15.0, 3L)) && got.contains(("1", 6L, 15.0, 3L)))
    } finally q.stop()
  }

  test("streaming rows-bounded agg equals the batch ROWS n PRECEDING frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Raw(1, 2, new java.sql.Timestamp(1020 * 1000), 2.0),
      Raw(1, 1, new java.sql.Timestamp(1010 * 1000), 1.0),
      Raw(1, 3, new java.sql.Timestamp(1030 * 1000), 3.0),
      Raw(1, 4, new java.sql.Timestamp(1040 * 1000), 4.0),
      // equal-rowtime peers: ROWS frames are count-based, ids order them
      Raw(1, 5, new java.sql.Timestamp(1050 * 1000), 5.0),
      Raw(1, 6, new java.sql.Timestamp(1050 * 1000), 6.0),
      Raw(2, 7, new java.sql.Timestamp(1025 * 1000), 10.0))
    val input = MemoryStream[Raw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key".cast("string").as("key"), $"id", unix_millis($"ts").as("ts_ms"), array($"value").as("values"),
        array(lit(false)).as("nulls"),
        expr("CAST(array() AS ARRAY<STRING>)").as("svalues")).as[OverIn]
    val q = OverOps.boundedRowsAgg(
        toIn(input.toDF().withWatermark("ts", "5 seconds")), 3)
      .writeStream.outputMode("append").format("memory").queryName("rover_out").start()
    try {
      input.addData(rows.take(4): _*); q.processAllAvailable()
      input.addData(rows.drop(4): _*); q.processAllAvailable()
      input.addData(Raw(9, 99, new java.sql.Timestamp(9000 * 1000), 0.0)) // close
      q.processAllAvailable()
      val got = spark.table("rover_out").as[BoundedOverOut].collect()
        .filter(_.key != "9")
        .map(o => (o.key, o.id, o.range_sum.head, o.range_cnt)).toSet
      val w = Window.partitionBy($"key").orderBy($"ts_ms", $"id").rowsBetween(-2, 0)
      val want = toIn(rows.toDF())
        .select($"key", $"id", sum(element_at($"values", lit(1))).over(w).as("s"), count(lit(1)).over(w).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got == want)
      // id 6's frame is {4, 5, 6} — its equal-ts peer 5 counts as one row
      assert(got.contains(("1", 6L, 15.0, 3L)) && got.contains(("1", 5L, 12.0, 3L)))
    } finally q.stop()
  }

  test("a row at epoch (ts_ms = 0) is not treated as late at stream start") {
    // regression: the emitted frontier must start at Long.MinValue —
    // get() on unset ValueState[Long] null-unboxes to 0, which made the
    // late-row guard silently drop rows with ts_ms <= 0
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Raw(1, 1, new java.sql.Timestamp(0), 1.0),
      Raw(1, 2, new java.sql.Timestamp(50 * 1000), 2.0))
    val input = MemoryStream[Raw]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .select($"key".cast("string").as("key"), $"id", unix_millis($"ts").as("ts_ms"), array($"value").as("values"),
        array(lit(false)).as("nulls"),
        expr("CAST(array() AS ARRAY<STRING>)").as("svalues")).as[OverIn]
    val q = OverOps.boundedRangeAgg(
        toIn(input.toDF().withWatermark("ts", "5 seconds")), 120000L)
      .writeStream.outputMode("append").format("memory").queryName("eover_out").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      input.addData(Raw(9, 99, new java.sql.Timestamp(9000 * 1000), 0.0)) // close
      q.processAllAvailable()
      val got = spark.table("eover_out").as[BoundedOverOut].collect()
        .filter(_.key != "9")
        .map(o => (o.key, o.id, o.range_sum.head, o.range_cnt)).toSet
      assert(got == Set(("1", 1L, 1.0, 1L), ("1", 2L, 3.0, 2L)))
    } finally q.stop()
  }

  test("DATE value slots (epoch days + null mask) stream equal batch MIN/MAX/FIRST/LAG") {
    // the typed-layer pin of the SQL deployment's DATE encoding
    // (RowtimeOver.lower: unix_date → the double vector, NULL rides the
    // mask, date_from_unix_date restores at the splice) — so a parser
    // change can't silently orphan the kernel path
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def d(s: String) = java.sql.Date.valueOf(s)
    val rows = Seq( // (key, id, ts, date-or-null)
      (1L, 1L, new java.sql.Timestamp(1010 * 1000), Some(d("2024-03-01"))),
      (1L, 2L, new java.sql.Timestamp(1020 * 1000), None),
      (1L, 3L, new java.sql.Timestamp(1030 * 1000), Some(d("2023-12-31"))),
      (1L, 4L, new java.sql.Timestamp(1040 * 1000), Some(d("2024-07-15"))))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Option[java.sql.Date])]
    val toIn = (df: org.apache.spark.sql.DataFrame) => df
      .toDF("key", "id", "ts", "dt")
      .select($"key".cast("string").as("key"), $"id",
        unix_millis($"ts").as("ts_ms"),
        array(coalesce(unix_date($"dt").cast("double"), lit(0.0))).as("values"),
        when(isnull($"dt"), array(lit(true)))
          .otherwise(expr("CAST(array() AS ARRAY<BOOLEAN>)")).as("nulls"),
        expr("CAST(array() AS ARRAY<STRING>)").as("svalues")).as[OverIn]
    val q = OverOps.runningAgg(
        toIn(input.toDF().withWatermark("_3", "5 seconds")), lagMax = 1)
      .writeStream.outputMode("append").format("memory").queryName("dover_out").start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      input.addData((9L, 99L, new java.sql.Timestamp(9000 * 1000),
        None: Option[java.sql.Date])) // close the watermark
      q.processAllAvailable()
      // decode exactly as the SQL splice does
      val got = spark.table("dover_out")
        .filter($"key" =!= "9")
        .select($"id",
          // nn_cnt is EMPTY on the no-nulls fast path — mirror nnOf()
          expr("CASE WHEN coalesce(try_element_at(nn_cnt, 1), running_cnt) > 0 " +
            "THEN date_from_unix_date(CAST(running_min[0] AS INT)) END").as("mn"),
          expr("CASE WHEN coalesce(try_element_at(nn_cnt, 1), running_cnt) > 0 " +
            "THEN date_from_unix_date(CAST(running_max[0] AS INT)) END").as("mx"),
          expr("CASE WHEN coalesce(try_element_at(first_null, 1), false) THEN CAST(NULL AS DATE) " +
            "ELSE date_from_unix_date(CAST(first_v[0] AS INT)) END").as("fv"),
          expr("CASE WHEN coalesce(try_element_at(try_element_at(lags_null, 1), 1), false) THEN CAST(NULL AS DATE) " +
            "ELSE date_from_unix_date(CAST(try_element_at(try_element_at(lags, 1), 1) AS INT)) END").as("lg"))
        .collect().map(r => (r.getLong(0), Option(r.getDate(1)), Option(r.getDate(2)),
          Option(r.getDate(3)), Option(r.getDate(4)))).toSet
      val w = Window.partitionBy($"key").orderBy($"ts", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = rows.toDF("key", "id", "ts", "dt")
        .select($"id", min($"dt").over(w).as("mn"), max($"dt").over(w).as("mx"),
          first($"dt").over(w).as("fv"),
          lag($"dt", 1).over(Window.partitionBy($"key").orderBy($"ts", $"id")).as("lg"))
        .collect().map(r => (r.getLong(0), Option(r.getDate(1)), Option(r.getDate(2)),
          Option(r.getDate(3)), Option(r.getDate(4)))).toSet
      assert(got == want,
        s"DATE slots stream vs batch: stream-only=${(got -- want).take(3)} " +
          s"batch-only=${(want -- got).take(3)}")
    } finally q.stop()
  }
}
