package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Flink-named scalar functions (graft.functions.FlinkFunctions;
  * SURVEY.md §2.8): semantics pinned against the reference's documented
  * behavior — SPLIT_INDEX's 0-based NULL-out-of-bounds contract,
  * FROM/TO_BASE64 string typing, JSON_VALUE/JSON_EXISTS lax access,
  * TRUNCATE toward zero, TO_TIMESTAMP_LTZ numeric-epoch precisions —
  * and Spark's own to_timestamp_ltz string form must survive the
  * name being shadowed.
  */
class FlinkFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    s
  }

  private def one(sql: String): Row = spark.sql(s"SELECT $sql").head()

  test("split_index: 0-based, NULL out of bounds or negative, keeps empty segments") {
    assert(one("split_index('a,b,c', ',', 0)").getString(0) == "a")
    assert(one("split_index('a,b,c', ',', 2)").getString(0) == "c")
    assert(one("split_index('a,b,c', ',', 3)").isNullAt(0)) // OOB → NULL, not ''
    assert(one("split_index('a,b,c', ',', -1)").isNullAt(0)) // negative → NULL
    assert(one("split_index('error', 'e', 1)").getString(0) == "rror")
    assert(one("split_index('purchase', 'e', 1)").getString(0) == "") // trailing empty kept
    assert(one("split_index('click', 'e', 1)").isNullAt(0)) // separator absent
    assert(one("split_index(CAST(NULL AS STRING), ',', 0)").isNullAt(0))
  }

  test("to_base64 / from_base64: Flink's names, string in/string out") {
    assert(one("to_base64('flink')").getString(0) == "Zmxpbms=")
    assert(one("from_base64('Zmxpbms=')").getString(0) == "flink")
    assert(one("from_base64(to_base64('héllo, wörld'))").getString(0) == "héllo, wörld")
  }

  test("json_value / json_exists: lax scalar access; NULL json propagates") {
    assert(one("""json_value('{"k": 69}', '$.k')""").getString(0) == "69")
    assert(one("""json_value('{"a": {"b": "x"}}', '$.a.b')""").getString(0) == "x")
    assert(one("""json_value('{"k": 69}', '$.missing')""").isNullAt(0))
    assert(one("""json_exists('{"k": 69}', '$.k')""").getBoolean(0))
    assert(!one("""json_exists('{"k": 69}', '$.missing')""").getBoolean(0))
    assert(one("""json_exists(CAST(NULL AS STRING), '$.k')""").isNullAt(0))
    // JSON_QUERY: fragment (object/array) access as JSON text
    assert(one("""json_query('{"a": {"b": 1}}', '$.a')""").getString(0) == """{"b":1}""")
    assert(one("""json_query('{"a": [1, 2, 3]}', '$.a')""").getString(0) == "[1,2,3]")
  }

  test("truncate: toward zero at scale n (floor above zero, ceil below), default scale 0") {
    assert(one("CAST(truncate(3.35, 1) AS DOUBLE)").getDouble(0) == 3.3)
    assert(one("CAST(truncate(-3.35, 1) AS DOUBLE)").getDouble(0) == -3.3)
    assert(one("CAST(truncate(42.73) AS DOUBLE)").getDouble(0) == 42.0)
    assert(one("CAST(truncate(-42.73) AS DOUBLE)").getDouble(0) == -42.0)
    assert(one("CAST(truncate(CAST(2.999 AS DOUBLE), 2) AS DOUBLE)").getDouble(0) == 2.99)
  }

  test("to_timestamp_ltz: numeric epoch at precision 0/3/6; string form still Spark's") {
    assert(one("unix_seconds(to_timestamp_ltz(1700000000, 0))").getLong(0) == 1700000000L)
    assert(one("unix_millis(to_timestamp_ltz(1700000000123, 3))").getLong(0) == 1700000000123L)
    assert(one("unix_micros(to_timestamp_ltz(1700000000123456, 6))").getLong(0) == 1700000000123456L)
    // registering the Flink form must not break Spark's native string form
    assert(one("unix_seconds(to_timestamp_ltz('2023-11-14 22:13:20'))").getLong(0) == 1700000000L)
    assert(one("unix_seconds(to_timestamp_ltz('14/11/2023 22:13:20', 'dd/MM/yyyy HH:mm:ss'))")
      .getLong(0) == 1700000000L)
  }

  test("is_alpha / is_digit / is_decimal legacy predicates; rand_integer bounds") {
    assert(one("is_alpha('Spark')").getBoolean(0))
    assert(!one("is_alpha('Spark4')").getBoolean(0))
    assert(!one("is_alpha('')").getBoolean(0))
    assert(one("is_digit('0042')").getBoolean(0))
    assert(!one("is_digit('42.5')").getBoolean(0))
    assert(one("is_decimal('42.5')").getBoolean(0))
    assert(one("is_decimal('-1e3')").getBoolean(0))
    assert(!one("is_decimal('4a')").getBoolean(0))
    assert(one("is_decimal(CAST(NULL AS STRING))").isNullAt(0))
    // one-arg form: the sole argument is the bound
    val unseeded = spark.sql(
      "SELECT rand_integer(10) AS x FROM range(1000)").collect().map(_.getInt(0))
    assert(unseeded.forall(x => x >= 0 && x < 10) && unseeded.distinct.length > 5)
    // two-arg form is (seed, bound) — Flink's RAND_INTEGER(INT seed, INT bound)
    val draws = spark.sql(
      "SELECT rand_integer(7, 10) AS x FROM range(1000)").collect().map(_.getInt(0))
    assert(draws.forall(x => x >= 0 && x < 10) && draws.distinct.length > 5)
    // seeded form is reproducible
    val again = spark.sql(
      "SELECT rand_integer(7, 10) AS x FROM range(1000)").collect().map(_.getInt(0))
    assert(draws.toSeq == again.toSeq)
  }

  test("convert_tz rebases wall-clock strings; SHA names hit the NIST vectors") {
    assert(one("convert_tz('2024-01-01 12:00:00', 'UTC', 'Asia/Shanghai')")
      .getString(0) == "2024-01-01 20:00:00")
    // DST-aware: New York is UTC-4 in July
    assert(one("convert_tz('2024-07-01 00:00:00', 'America/New_York', 'UTC')")
      .getString(0) == "2024-07-01 04:00:00")
    // the FIPS-180 'abc' test vectors
    assert(one("sha224('abc')").getString(0) ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(one("sha256('abc')").getString(0) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one("sha384('abc')").getString(0) ==
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed" +
      "8086072ba1e7cc2358baeca134c825a7")
    assert(one("sha512('abc')").getString(0) ==
      "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
      "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")
  }

  test("single_value: the group's sole value; >1 row in a group raises") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (2, "c")).toDF("k", "v").createOrReplaceTempView("sv_t")
    val ok = spark.sql("SELECT single_value(v) AS v FROM sv_t WHERE k = 1 GROUP BY k")
      .head().getString(0)
    assert(ok == "a")
    val e = intercept[Exception] {
      spark.sql("SELECT single_value(v) AS v FROM sv_t GROUP BY k").collect()
    }
    assert(e.getMessage.contains("SINGLE_VALUE") ||
      Option(e.getCause).exists(_.getMessage.contains("SINGLE_VALUE")))
    // a single NULL row is one row, not an error
    assert(spark.sql("SELECT single_value(CAST(NULL AS STRING)) AS v FROM range(1)")
      .head().isNullAt(0))
  }

  test("json predicates and constructors: is_json / json_string / json_array / element") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT is_json('{"a": 1}') AS j1, is_json('not json') AS j2,
        |  is_json('null') AS j3, is_json(CAST(NULL AS STRING)) AS j4,
        |  json_string('abc') AS s1, json_string(42) AS s2,
        |  json_string(CAST(NULL AS STRING)) AS s3,
        |  json_array(1, 2, 3) AS a1,
        |  element(array(7)) AS e1, element(array()) AS e2
        |""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.isNullAt(3))
    assert(r.getString(4) == "\"abc\"" && r.getString(5) == "42" && r.isNullAt(6))
    assert(r.getString(7) == "[1,2,3]")
    assert(r.getInt(8) == 7 && r.isNullAt(9))
    val err = intercept[Exception] {
      spark.sql("SELECT element(array(1, 2))").collect()
    }
    assert(err.getMessage.contains("ELEMENT") ||
      Option(err.getCause).exists(_.getMessage.contains("ELEMENT")))
  }

  test("JSON_OBJECT KEY/VALUE syntax rewrites onto to_json(named_struct)") {
    import graft.plans.JsonObjectRewrite._
    val keepNulls = ", map('ignoreNullFields', 'false')"
    assert(rewrite("SELECT JSON_OBJECT('k' VALUE 1) AS j")
      == s"SELECT to_json(named_struct('k', 1)$keepNulls) AS j")
    assert(rewrite("SELECT JSON_OBJECT(KEY 'a' VALUE x, 'b' VALUE y + 1) AS j")
      == s"SELECT to_json(named_struct('a', x, 'b', y + 1)$keepNulls) AS j")
    // bare form and explicit NULL ON NULL both emit JSON nulls (the
    // SQL-standard/Flink default); ABSENT ON NULL drops the key
    assert(rewrite("SELECT JSON_OBJECT('k' VALUE v NULL ON NULL) AS j")
      == s"SELECT to_json(named_struct('k', v)$keepNulls) AS j")
    assert(rewrite("SELECT JSON_OBJECT('k' VALUE v ABSENT ON NULL) AS j")
      == "SELECT to_json(named_struct('k', v)) AS j")
    // nested objects recurse
    assert(rewrite("SELECT JSON_OBJECT('o' VALUE JSON_OBJECT('i' VALUE 2)) AS j")
      == s"SELECT to_json(named_struct('o', to_json(named_struct('i', 2)$keepNulls))$keepNulls) AS j")
    // end-to-end through the dialect
    val r = FlinkSql.sql(spark,
      "SELECT JSON_OBJECT('t' VALUE 'x', 'n' VALUE 7) AS j").head().getString(0)
    assert(r == "{\"t\":\"x\",\"n\":7}")
    // a null value serializes as a JSON null by default...
    val rn = FlinkSql.sql(spark,
      "SELECT JSON_OBJECT('t' VALUE CAST(NULL AS STRING), 'n' VALUE 7) AS j")
      .head().getString(0)
    assert(rn == "{\"t\":null,\"n\":7}")
    // ...and is omitted under explicit ABSENT ON NULL
    val ra = FlinkSql.sql(spark,
      "SELECT JSON_OBJECT('t' VALUE CAST(NULL AS STRING), 'n' VALUE 7 ABSENT ON NULL) AS j")
      .head().getString(0)
    assert(ra == "{\"n\":7}")
  }

  test("ARRAY[...] / MAP[...] bracket constructors rewrite through the dialect") {
    import graft.plans.BracketConstructors._
    assert(rewrite("SELECT ARRAY[1, 2] AS v") == "SELECT array(1, 2) AS v")
    assert(rewrite("SELECT MAP['a', 1]['a'] AS v") == "SELECT map('a', 1)['a'] AS v")
    // nesting, embedded subscripts, literals with brackets stay intact
    assert(rewrite("SELECT ARRAY[ARRAY[1], ARRAY[2]] AS v")
      == "SELECT array(array(1), array(2)) AS v")
    assert(rewrite("SELECT 'ARRAY[9]' AS s") == "SELECT 'ARRAY[9]' AS s")
    assert(rewrite("SELECT ARRAY['it''s', 'ok'] AS v")
      == "SELECT array('it''s', 'ok') AS v")
    assert(rewrite("SELECT str_to_map('a=1')['a'] AS v")
      == "SELECT str_to_map('a=1')['a'] AS v") // MAP-suffixed names untouched
    // double-quoted literals and backtick identifiers are copied wholesale
    assert(rewrite("SELECT \"ARRAY[1]\" AS s") == "SELECT \"ARRAY[1]\" AS s")
    assert(rewrite("SELECT `my ARRAY[x]` FROM t") == "SELECT `my ARRAY[x]` FROM t")
    assert(rewrite("SELECT ARRAY[\"a[\", `b]`] AS v")
      == "SELECT array(\"a[\", `b]`) AS v") // quoted spans inside a body too
    // end-to-end through FlinkSql
    assert(FlinkSql.sql(spark, "SELECT ELEMENT(ARRAY[5]) + MAP['k', 2]['k'] AS v")
      .head().getInt(0) == 7)
  }

  test("multiset_cardinality / multiset_contains over the MAP<T, INT> convention") {
    // COLLECT builds the multiset (map -> multiplicity); CARDINALITY
    // counts elements INCLUDING duplicates, MEMBER OF is containment
    val r = FlinkSql.sql(spark,
      """SELECT multiset_cardinality(ms) AS n,
        |       multiset_contains(ms, 'a') AS has_a,
        |       multiset_contains(ms, 'zz') AS has_zz,
        |       multiset_cardinality(CAST(NULL AS MAP<STRING, INT>)) AS n_null
        |FROM (SELECT map('a', 2, 'b', 1) AS ms)""".stripMargin).head()
    assert(r.getLong(0) == 3L) // 2 a's + 1 b, not 2 entries
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.isNullAt(3))
    // composes with the COLLECT aggregate's output
    import spark.implicits._
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("ms_src")
    val c = FlinkSql.sql(spark,
      "SELECT multiset_cardinality(collect(v)) AS n FROM ms_src").head()
    assert(c.getLong(0) == 3L)
  }

  test("to_time / time_to_string round-trip the TIME(p) millis-of-day convention") {
    val r = FlinkSql.sql(spark,
      """SELECT to_time('12:34:56.789') AS a,
        |       to_time('00:00:07') AS b,
        |       time_to_string(45296789) AS s,
        |       time_to_string(to_time('23:59:59.999')) AS rt,
        |       to_time(time_to_string(7000)) AS rt2""".stripMargin).head()
    assert(r.getInt(0) == 12 * 3600000 + 34 * 60000 + 56789, r.toString)
    assert(r.getInt(1) == 7000)
    assert(r.getString(2) == "12:34:56.789")
    assert(r.getString(3) == "23:59:59.999")
    assert(r.getInt(4) == 7000)
  }

  test("the pack stays codegen-resident (no interpreted eval in the plan)") {
    Tables.events(spark, TestSpark.sfDir).createOrReplaceTempView("ff_events")
    val df = spark.sql(
      """SELECT split_index(event_type, 'e', 1) AS a,
        |  json_value(props, '$.k') AS b,
        |  CAST(truncate(value, 1) AS DOUBLE) AS c
        |FROM ff_events""".stripMargin)
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.limit(5).collect().nonEmpty)
  }
}
