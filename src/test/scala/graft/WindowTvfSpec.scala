package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.WindowTvf

/** SQL-text window TVFs (TUMBLE/HOP/CUMULATE over TABLE(...)): the
  * rewritten subqueries must agree with the DataFrame-native
  * formulations (window(), Cumulate.assign) on the events fixture, and
  * the injected parser must accept the raw syntax.
  */
class WindowTvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def events = {
    val df = Tables.events(spark, TestSpark.sfDir)
    df.createOrReplaceTempView("tvf_events")
    df
  }

  private def agg(bucketed: org.apache.spark.sql.DataFrame) =
    bucketed.groupBy("window_start", "window_end", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .collect().map(r => r.toSeq).toSet

  test("TUMBLE TVF equals the native window() bucketing") {
    val df = events
    val got = agg(spark.sql(WindowTvf.rewrite(
      "SELECT * FROM TABLE(TUMBLE(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE))")))
    val want = agg(df.select(col("*"),
      window(col("ts"), "5 minutes").getField("start").as("window_start"),
      window(col("ts"), "5 minutes").getField("end").as("window_end")))
    assert(got == want && got.nonEmpty)
  }

  test("HOP TVF equals the native sliding window() bucketing") {
    val df = events
    val got = agg(spark.sql(WindowTvf.rewrite(
      """SELECT * FROM TABLE(HOP(TABLE tvf_events, DESCRIPTOR(ts),
        |INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))""".stripMargin)))
    val want = agg(df.select(col("*"),
      window(col("ts"), "10 minutes", "5 minutes").getField("start").as("window_start"),
      window(col("ts"), "10 minutes", "5 minutes").getField("end").as("window_end")))
    assert(got == want && got.nonEmpty)
  }

  test("CUMULATE TVF equals the Cumulate.assign operator") {
    val df = events
    val got = agg(spark.sql(WindowTvf.rewrite(
      """SELECT * FROM TABLE(CUMULATE(TABLE tvf_events, DESCRIPTOR(ts),
        |INTERVAL '2' MINUTE, INTERVAL '10' MINUTE))""".stripMargin)))
    val want = agg(graft.operators.Cumulate
      .assign(df, "ts", 600000L, 120000L)
      .withColumnRenamed("w_start", "window_start")
      .withColumnRenamed("w_end", "window_end"))
    assert(got == want && got.nonEmpty)
  }

  test("SESSION TVF equals the native session_window aggregation") {
    val df = events
    val got = spark.sql(WindowTvf.rewrite(
      """SELECT user_id, window_start, window_end, count(*) AS n
        |FROM TABLE(SESSION(TABLE tvf_events PARTITION BY user_id,
        |                   DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |GROUP BY user_id, window_start, window_end""".stripMargin))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).getTime, r.getAs[java.sql.Timestamp](2).getTime,
        r.getLong(3))).toSet
    val want = df.groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).getTime, r.getAs[java.sql.Timestamp](2).getTime,
        r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("SESSION TVF merges events exactly gap apart (Flink TimeWindow.intersects rule)") {
    import spark.implicits._
    // [t, t+gap) and [t+gap, t+2gap) abut; Flink's intersects() treats
    // abutting windows as intersecting, so these two events are ONE
    // session — and (verified here) Spark's native session_window agrees,
    // so a strictly-greater-than-gap new-session predicate matches both
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val next = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    Seq((1L, base), (1L, next)).toDF("user_id", "ts")
      .createOrReplaceTempView("gap_events")
    val got = spark.sql(WindowTvf.rewrite(
      """SELECT user_id, window_start, window_end, count(*) AS n
        |FROM TABLE(SESSION(TABLE gap_events PARTITION BY user_id,
        |                   DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |GROUP BY user_id, window_start, window_end""".stripMargin)).collect()
    assert(got.length == 1)
    assert(got(0).getAs[java.sql.Timestamp]("window_start") == base)
    assert(got(0).getAs[java.sql.Timestamp]("window_end") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:10:00"))
    assert(got(0).getAs[Long]("n") == 2L)
    val native = spark.table("gap_events")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .count().collect()
    assert(native.length == 1) // Spark merges the abutting windows too
  }

  test("TVF bucketing uses floor division for pre-epoch rowtimes") {
    import spark.implicits._
    // -90 s sits in tumble window [-120, 0) and in HOP(60s slide, 120s
    // size) windows [-180,-60) and [-120,0); truncate-toward-zero `div`
    // would misplace the start and drop the earliest covering window
    Seq((1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(-90L))))
      .toDF("user_id", "ts").createOrReplaceTempView("preepoch_events")
    val t = spark.sql(WindowTvf.rewrite(
      "SELECT window_start, window_end FROM TABLE(TUMBLE(TABLE preepoch_events, DESCRIPTOR(ts), INTERVAL '2' MINUTE))"))
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).toInstant.getEpochSecond,
        r.getAs[java.sql.Timestamp](1).toInstant.getEpochSecond)).toSet
    assert(t == Set((-120L, 0L)))
    val h = spark.sql(WindowTvf.rewrite(
      "SELECT window_start, window_end FROM TABLE(HOP(TABLE preepoch_events, DESCRIPTOR(ts), INTERVAL '1' MINUTE, INTERVAL '2' MINUTE))"))
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).toInstant.getEpochSecond,
        r.getAs[java.sql.Timestamp](1).toInstant.getEpochSecond)).toSet
    assert(h == Set((-180L, -60L), (-120L, 0L)))
  }

  test("window_time is emitted as window_end minus 1 ms (the reference's window rowtime)") {
    events
    val r = spark.sql(WindowTvf.rewrite(
      """SELECT window_start, window_end, window_time
        |FROM TABLE(TUMBLE(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |LIMIT 50""".stripMargin)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[java.sql.Timestamp]("window_time").getTime ==
        row.getAs[java.sql.Timestamp]("window_end").getTime - 1)
    }
    val s = spark.sql(WindowTvf.rewrite(
      """SELECT window_end, window_time
        |FROM TABLE(SESSION(TABLE tvf_events PARTITION BY user_id,
        |                   DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |LIMIT 50""".stripMargin)).collect()
    s.foreach { row =>
      assert(row.getAs[java.sql.Timestamp]("window_time").getTime ==
        row.getAs[java.sql.Timestamp]("window_end").getTime - 1)
    }
  }

  test("TUMBLE/HOP offset arg aligns windows like native window() startTime") {
    val df = events
    val t = agg(spark.sql(WindowTvf.rewrite(
      """SELECT * FROM TABLE(TUMBLE(TABLE tvf_events, DESCRIPTOR(ts),
        |INTERVAL '5' MINUTE, INTERVAL '90' SECOND))""".stripMargin)))
    val tWant = agg(df.select(col("*"),
      window(col("ts"), "5 minutes", "5 minutes", "90 seconds").getField("start").as("window_start"),
      window(col("ts"), "5 minutes", "5 minutes", "90 seconds").getField("end").as("window_end")))
    assert(t == tWant && t.nonEmpty)
    val h = agg(spark.sql(WindowTvf.rewrite(
      """SELECT * FROM TABLE(HOP(TABLE tvf_events, DESCRIPTOR(ts),
        |INTERVAL '5' MINUTE, INTERVAL '10' MINUTE, INTERVAL '1' MINUTE))""".stripMargin)))
    val hWant = agg(df.select(col("*"),
      window(col("ts"), "10 minutes", "5 minutes", "1 minute").getField("start").as("window_start"),
      window(col("ts"), "10 minutes", "5 minutes", "1 minute").getField("end").as("window_end")))
    assert(h == hWant && h.nonEmpty)
  }

  test("legacy GROUP BY TUMBLE lowers onto the TVF and equals native window()") {
    import graft.plans.LegacyGroupWindow
    val df = events
    val got = spark.sql(WindowTvf.rewrite(LegacyGroupWindow.rewrite(
      """SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) AS ws,
        |  TUMBLE_END(ts, INTERVAL '5' MINUTE) AS we,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM tvf_events
        |GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE), event_type""".stripMargin)))
      .collect().map(_.toSeq).toSet
    val want = df.groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start"), col("w.end"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("legacy GROUP BY HOP and SESSION lower with Flink arg orders and implicit keys") {
    import graft.plans.LegacyGroupWindow
    val df = events
    val hop = spark.sql(WindowTvf.rewrite(LegacyGroupWindow.rewrite(
      """SELECT HOP_START(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE) AS ws,
        |  count(*) AS n
        |FROM tvf_events
        |GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)""".stripMargin)))
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getLong(1))).toSet
    val hopWant = df.groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("n"))
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getLong(1))).toSet
    assert(hop == hopWant && hop.nonEmpty)
    // SESSION: the remaining group keys become the TVF's PARTITION BY, so
    // per-user sessionization matches the native session_window
    val sess = spark.sql(WindowTvf.rewrite(LegacyGroupWindow.rewrite(
      """SELECT user_id, SESSION_START(ts, INTERVAL '5' MINUTE) AS ws,
        |  count(*) AS n
        |FROM tvf_events
        |GROUP BY SESSION(ts, INTERVAL '5' MINUTE), user_id""".stripMargin)))
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime, r.getLong(2))).toSet
    val sessWant = df.groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime, r.getLong(2))).toSet
    assert(sess == sessWant && sess.nonEmpty)
  }

  test("legacy group windows reject unsupported shapes with clear errors") {
    import graft.plans.LegacyGroupWindow
    def err(sql: String): String =
      intercept[IllegalArgumentException](LegacyGroupWindow.rewrite(sql)).getMessage
    assert(err("SELECT count(*) FROM a JOIN b ON a.x = b.x GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE)")
      .contains("single table"))
    assert(err("""SELECT TUMBLE_START(ts, INTERVAL '2' MINUTE) FROM t
                 |GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE)""".stripMargin)
      .contains("repeat"))
    assert(err("SELECT TUMBLE_PROCTIME(ts, INTERVAL '1' MINUTE) FROM t GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE)")
      .contains("no batch equivalent"))
    // TUMBLE_ROWTIME maps to Flink's max-timestamp (end - 1 ms)
    val rt = LegacyGroupWindow.rewrite(
      "SELECT TUMBLE_ROWTIME(ts, INTERVAL '1' MINUTE) FROM t GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE)")
    assert(rt.contains("window_end - INTERVAL '1' MILLISECOND"))
    // statements without a legacy group window pass through untouched
    val plain = "SELECT event_type, count(*) FROM t GROUP BY event_type"
    assert(LegacyGroupWindow.rewrite(plain) == plain)
  }

  test("injected parser path accepts the TVF syntax; malformed args fail clearly") {
    events
    val parser = new graft.plans.GraftSqlParser(spark, spark.sessionState.sqlParser)
    val plan = parser.parsePlan(
      """SELECT window_start, count(*) AS n
        |FROM TABLE(TUMBLE(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |GROUP BY window_start""".stripMargin)
    assert(plan != null)
    val e = intercept[IllegalArgumentException] {
      WindowTvf.rewrite("SELECT * FROM TABLE(HOP(TABLE t, DESCRIPTOR(ts), INTERVAL '7' MINUTE, INTERVAL '10' MINUTE))")
    }
    assert(e.getMessage.contains("multiple of slide"))
    val e2 = intercept[IllegalArgumentException] {
      WindowTvf.rewrite("SELECT * FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' MONTH))")
    }
    assert(e2.getMessage.contains("INTERVAL"))
  }

  test("HOP window join: replicated rows pair only within a shared window") {
    val df = events
    df.filter(col("event_type") === "view").createOrReplaceTempView("tvf_hj_v")
    df.filter(col("event_type") === "click").createOrReplaceTempView("tvf_hj_c")
    val got = spark.sql(WindowTvf.rewrite(
      """SELECT L.window_start, L.user_id, L.event_id AS v_id, R.event_id AS c_id
        |FROM TABLE(HOP(TABLE tvf_hj_v, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)) L
        |JOIN TABLE(HOP(TABLE tvf_hj_c, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)) R
        |  ON L.window_start = R.window_start AND L.window_end = R.window_end
        | AND L.user_id = R.user_id""".stripMargin))
      .collect().map(_.toSeq).toSet
    // native formulation: both sides through window() with the slide
    def native(t: String) = df.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"),
        window(col("ts"), "10 minutes", "5 minutes").as("w"))
    val want = native("view").as("L")
      .join(native("click").as("R"), Seq("w", "user_id"))
      .select(col("w.start"), col("user_id"), col("L.event_id"), col("R.event_id"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("FLIP-387 named parameters normalize to positional (batch + streaming)") {
    events
    val positional =
      """SELECT window_start, event_type, count(*) AS n
        |FROM TABLE(HOP(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, event_type""".stripMargin
    val named =
      """SELECT window_start, event_type, count(*) AS n
        |FROM TABLE(HOP(SIZE => INTERVAL '10' MINUTE, DATA => TABLE tvf_events,
        |               SLIDE => INTERVAL '5' MINUTE, TIMECOL => DESCRIPTOR(ts)))
        |GROUP BY window_start, window_end, event_type""".stripMargin
    val a = spark.sql(WindowTvf.rewrite(positional)).collect().map(_.toSeq).toSet
    val b = spark.sql(WindowTvf.rewrite(named)).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    val c = spark.sql(WindowTvf.rewriteStreaming(named)).collect().map(_.toSeq).toSet
    assert(c == a)
    val e = intercept[IllegalArgumentException](WindowTvf.rewrite(
      "SELECT 1 FROM TABLE(TUMBLE(DATA => TABLE t, DESCRIPTOR(ts), INTERVAL '1' MINUTE))"))
    assert(e.getMessage.contains("mix of named and positional"), e.getMessage)
    // all-named with a REQUIRED name omitted must error, not silently
    // compact OFFSET into the SIZE slot (Flink rejects the missing SIZE)
    val e2 = intercept[IllegalArgumentException](WindowTvf.rewrite(
      """SELECT 1 FROM TABLE(TUMBLE(DATA => TABLE tvf_events,
        |  TIMECOL => DESCRIPTOR(ts), OFFSET => INTERVAL '1' MINUTE))""".stripMargin))
    assert(e2.getMessage.contains("missing required argument") &&
      e2.getMessage.contains("SIZE"), e2.getMessage)
  }

  test("rewriteStreaming's native-window grouping equals the batch TVF rewrite") {
    events
    for (tvf <- Seq(
      "TUMBLE(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE)",
      "HOP(TABLE tvf_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)")) {
      val sqlText =
        s"""SELECT window_start, window_end, event_type, count(*) AS n,
           |       round(sum(value), 2) AS sum_value
           |FROM TABLE($tvf)
           |GROUP BY window_start, window_end, event_type""".stripMargin
      val batch = spark.sql(WindowTvf.rewrite(sqlText)).collect().map(_.toSeq).toSet
      val native = spark.sql(WindowTvf.rewriteStreaming(sqlText)).collect().map(_.toSeq).toSet
      assert(native == batch, s"streaming rewrite diverges for $tvf")
    }
    val e = intercept[IllegalArgumentException](WindowTvf.rewriteStreaming(
      """SELECT 1 FROM TABLE(TUMBLE(TABLE a, DESCRIPTOR(ts), INTERVAL '1' MINUTE)) L
        |JOIN TABLE(TUMBLE(TABLE b, DESCRIPTOR(ts), INTERVAL '1' MINUTE)) R ON L.x = R.x""".stripMargin))
    assert(e.getMessage.contains("WindowJoin"), e.getMessage)
  }

  test("rewriteStreaming SESSION on native session_window equals the batch TVF rewrite") {
    events
    val sqlText =
      """SELECT window_start, window_end, user_id, count(*) AS n,
        |       round(sum(value), 2) AS sv
        |FROM TABLE(SESSION(TABLE tvf_events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |GROUP BY window_start, window_end, user_id""".stripMargin
    val batch = spark.sql(WindowTvf.rewrite(sqlText)).collect().map(_.toSeq).toSet
    val native = spark.sql(WindowTvf.rewriteStreaming(sqlText)).collect().map(_.toSeq).toSet
    assert(native == batch && native.nonEmpty)
  }

  test("window SEMI + ANTI partition every left row exactly once (q138 contract)") {
    val d = TestSpark.sfDir
    val both = SparkEntry.queries("q138_window_semi_anti")(spark, d)
    val views = Tables.events(spark, d).filter(col("event_type") === "view")
    // each view row lands in exactly one of the two branches
    assert(both.count() == views.count())
    assert(both.groupBy("view_id").count().filter(col("count") > 1).isEmpty)
  }
}
