package graft.tools

import graft.{FlinkSql, GraftSession}

/** Dev probe: what does a NULL in a streaming-OVER value column do
  * today? The kernel rides values as Seq[Double] (primitive) — a null
  * element may crash the encoder, silently coerce, or flow as null.
  * Usage: runMain graft.tools.ProbeNullOver
  */
object ProbeNullOver {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-probe-nullover")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe_nullover").toString
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    Seq((1L, 1L, t(10), Some(1.0)), (2L, 1L, t(20), None),
      (3L, 1L, t(30), Some(4.0)), (9L, 9L, t(900), Some(0.0)))
      .toDF("event_id", "user_id", "ts", "v")
      .write.mode("append").parquet(s"$dir/src")
    FlinkSql.run(spark,
      s"""CREATE TABLE no_src (
         |  event_id BIGINT, user_id BIGINT, ts TIMESTAMP(3), v DOUBLE,
         |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
         |) WITH ('connector' = 'filesystem', 'path' = '$dir/src',
         |        'format' = 'parquet');
         |CREATE TABLE no_sink (event_id BIGINT, s DOUBLE, c BIGINT)
         |WITH ('connector' = 'filesystem', 'path' = '$dir/sink',
         |      'format' = 'parquet')""".stripMargin)
    try {
      FlinkSql.runStream(spark,
        """INSERT INTO no_sink
          |SELECT event_id, sum(v) OVER w AS s, count(*) OVER w AS c
          |FROM no_src
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .awaitTermination()
      spark.read.parquet(s"$dir/sink").orderBy("event_id").collect()
        .foreach(r => println(s"[nullover] $r"))
      // batch comparison: SQL SUM skips NULLs
      FlinkSql.sql(spark,
        """SELECT event_id, sum(v) OVER w AS s, count(*) OVER w AS c
          |FROM no_src
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)
        .orderBy("event_id").collect()
        .foreach(r => println(s"[nullover-batch] $r"))
    } catch {
      case e: Throwable =>
        println(s"[nullover] STREAM FAILED: ${e.getClass.getName}: ${e.getMessage}")
        var c = e.getCause
        var d = 0
        while (c != null && d < 5) { println(s"[nullover]   cause: ${c.getMessage}"); c = c.getCause; d += 1 }
    }
    spark.stop()
  }
}
