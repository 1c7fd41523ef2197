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
}
