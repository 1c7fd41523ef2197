package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class LineSlim(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

/** API-surface parity pieces: typed Dataset[T] (Flink DataStream<T>
  * analog, SURVEY.md §1.1), catalog DDL (§1.3), dynamic session gap
  * (§2.5).
  */
class ApiSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed Dataset[T]: case-class encoder, groupByKey + mapGroups") {
    import spark.implicits._
    val ds = Tables.lineitem(spark, TestSpark.sfDir)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[LineSlim]
    val typedAgg = ds.groupByKey(_.l_returnflag)
      .mapGroups { (k, it) =>
        val xs = it.toSeq; (k, xs.length.toLong, xs.map(_.l_quantity).sum)
      }
      .collect().map { case (k, n, q) => k -> ((n, math.round(q))) }.toMap
    val sqlAgg = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy($"l_returnflag").agg(count(lit(1)), sum($"l_quantity"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), math.round(r.getDouble(2))))).toMap
    assert(typedAgg == sqlAgg)
  }

  test("catalog DDL: CREATE TABLE / INSERT / SELECT through the session catalog") {
    val tbl = "graft_ddl_demo"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, name STRING, score DOUBLE) USING parquet")
    try {
      spark.sql(s"INSERT INTO $tbl VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', NULL)")
      val got = spark.sql(s"SELECT count(*), sum(score) FROM $tbl").head()
      assert(got.getLong(0) == 3 && got.getDouble(1) == 4.0)
      assert(spark.catalog.tableExists(tbl))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("session window with dynamic (per-row) gap closes per the row's gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // purchases tolerate a 60s gap, everything else 10s
    val gap = when($"event_type" === "purchase", "60 seconds").otherwise("10 seconds")
    val q = input.toDF().withWatermark("ts", "5 seconds")
      .groupBy(session_window($"ts", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"user_id", $"n")
      .writeStream.outputMode("append").format("memory").queryName("dynsess").start()
    try {
      def ev2(id: Long, sec: Long, typ: String) =
        Ev(id, new java.sql.Timestamp(sec * 1000), 1L, typ, 1.0)
      // clicks at 1000, 1030: 10s gap → two sessions
      // purchases at 2000, 2030: 60s gap → one session
      input.addData(ev2(1, 1000, "click"), ev2(2, 1030, "click"),
        ev2(3, 2000, "purchase"), ev2(4, 2030, "purchase"))
      q.processAllAvailable()
      input.addData(ev2(99, 9000, "click")) // close everything
      q.processAllAvailable()
      val got = spark.table("dynsess")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(2))).toSet
      assert(got == Set((1000000L, 1L), (1030000L, 1L), (2000000L, 2L)))
    } finally q.stop()
  }
}
