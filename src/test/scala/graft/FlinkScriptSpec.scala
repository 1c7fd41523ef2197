package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The migration promise end-to-end: a multi-statement Flink SQL script
  * (connector DDL, blackhole sink, INSERT INTO, legacy group window,
  * Flink-named functions) runs through `graft.FlinkSql.run` on a plain
  * session — no extensions, no per-feature API calls.
  */
class FlinkScriptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a whole Flink SQL script runs via FlinkSql.run on a plain session") {
    // stage a micros-timestamp events copy (the raw fixture is nanos)
    val dir = java.nio.file.Files.createTempDirectory("flink_script").toString
    Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val last = FlinkSql.run(spark,
      s"""
         |CREATE TABLE script_events (
         |  event_id BIGINT,
         |  user_id BIGINT,
         |  event_type STRING,
         |  value DOUBLE,
         |  ts TIMESTAMP(3),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
         |) WITH ('connector' = 'filesystem',
         |        'path' = '$dir/events.parquet', 'format' = 'parquet');
         |
         |CREATE TABLE script_sink (k BIGINT, n BIGINT)
         |WITH ('connector' = 'blackhole');
         |
         |INSERT INTO script_sink
         |SELECT user_id AS k, count(*) AS n FROM script_events GROUP BY user_id;
         |
         |SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE) AS ws,
         |       split_index(event_type, 'e', 0) AS head_seg,
         |       count(*) AS n
         |FROM script_events
         |GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE), split_index(event_type, 'e', 0)
         |""".stripMargin)
    val got = last.collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ws").getTime,
        r.getAs[String]("head_seg"), r.getAs[Long]("n"))).toSet
    val want = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window(col("ts"), "10 minutes").as("w"),
        expr("split_index(event_type, 'e', 0)").as("head_seg"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("w")
        .getAs[java.sql.Timestamp]("start").getTime,
        r.getAs[String]("head_seg"), r.getAs[Long]("n"))).toSet
    assert(got == want && got.nonEmpty)
    // the quote-aware splitter held the statements together correctly
    assert(FlinkSql.statements("SELECT ';'; SELECT 'a''b;c'").size == 2)
  }

  test("statements(): comments never open literals or split statements") {
    // an apostrophe in a -- comment must not flip quote state
    assert(FlinkSql.statements(
      "SELECT 1 -- don't trip\n; SELECT 2").size == 2)
    // a ; inside a -- comment is not a statement boundary
    assert(FlinkSql.statements(
      "SELECT 1 -- a;b\nFROM range(1); SELECT 2").size == 2)
    // a ; or ' inside a /* */ block is plain text, even spanning lines
    val block = FlinkSql.statements(
      "SELECT 1 /* don't; really\n don't */; SELECT 2 /* fin */")
    assert(block.size == 2 && block(0).contains("/* don't; really"))
    // unterminated block comment swallows the rest (no phantom split)
    assert(FlinkSql.statements("SELECT 1 /* open; forever").size == 1)
    // comments survive end-to-end through the SQL parser
    assert(FlinkSql.run(spark,
      "-- header; with 'quotes'\nSELECT 40 + 2 AS x /* don't split; */")
      .head().getInt(0) == 42)
  }

  test("runStream: INSERT INTO runs as a streaming job (source → file sink)") {
    val dir = java.nio.file.Files.createTempDirectory("flink_stream_ins").toString
    Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/src.parquet")
    val q = FlinkSql.runStream(spark,
      s"""
         |CREATE TABLE ins_src (
         |  event_id BIGINT, user_id BIGINT, event_type STRING,
         |  value DOUBLE, ts TIMESTAMP(3),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
         |) WITH ('connector' = 'filesystem',
         |        'path' = '$dir/src.parquet', 'format' = 'parquet');
         |
         |CREATE TABLE ins_sink (event_id BIGINT, user_id BIGINT, v2 DOUBLE)
         |WITH ('connector' = 'filesystem', 'path' = '$dir/out', 'format' = 'parquet');
         |
         |INSERT INTO ins_sink
         |SELECT event_id, user_id, value * 2 AS v2 FROM ins_src WHERE user_id % 2 = 0
         |""".stripMargin)
    q.awaitTermination(120000)
    val want = spark.read.parquet(s"$dir/src.parquet")
      .filter(expr("user_id % 2 = 0")).count()
    assert(want > 0 && spark.read.parquet(s"$dir/out").count() == want)
    // the source view reverted to batch for subsequent statements
    assert(!spark.table("ins_src").isStreaming)
    // a refining aggregate streams to blackhole in update mode
    val q2 = FlinkSql.runStream(spark,
      s"""CREATE TABLE ins_bh (user_id BIGINT, n BIGINT)
         |WITH ('connector' = 'blackhole');
         |INSERT INTO ins_bh SELECT user_id, count(*) AS n FROM ins_src GROUP BY user_id
         |""".stripMargin)
    q2.awaitTermination(120000)
    assert(q2.lastProgress != null)
  }

  test("MATCH_RECOGNIZE and FOR SYSTEM_TIME AS OF route through FlinkSql too") {
    import spark.implicits._
    Seq((1L, 1L, "v"), (1L, 2L, "v"), (1L, 3L, "c"), (2L, 4L, "v"))
      .toDF("user_id", "event_id", "sym").createOrReplaceTempView("fs_cep")
    val cep = FlinkSql.sql(spark,
      """SELECT user_id, count(*) AS n
        |FROM fs_cep MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V V C)
        |  DEFINE V AS sym = 'v', C AS sym = 'c'
        |) AS m
        |GROUP BY user_id""".stripMargin).collect()
    assert(cep.length == 1 && cep(0).getLong(0) == 1L)
    Seq(("A", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.5))
      .toDF("ccy", "ots", "rate").createOrReplaceTempView("fs_rates")
    Seq((7L, "A", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("oid", "ccy", "ots").createOrReplaceTempView("fs_orders")
    val asof = FlinkSql.sql(spark,
      """SELECT o.oid, r.rate FROM fs_orders AS o
        |JOIN fs_rates FOR SYSTEM_TIME AS OF o.ots AS r ON r.ccy = o.ccy""".stripMargin)
      .collect()
    assert(asof.length == 1 && asof(0).getLong(0) == 7L && asof(0).getDouble(1) == 1.5)
  }
}
