package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.{BracketConstructors, JsonObjectRewrite, UnnestRewrite}

/** Fuzz the dialect text rewrites: every statement a user can type must
  * either pass through byte-identical (no trigger construct present) or
  * be rewritten/rejected with a clean IllegalArgumentException — never a
  * crash, never silent corruption of non-dialect SQL. The generator
  * leans into the hostile shapes: stray quotes of all three kinds,
  * unbalanced brackets/parens, keyword fragments in odd positions.
  */
class RewriteFuzzSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val junk: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\'', '"', '`', '[', ']', '(', ')',
        ',', '.', ' ', '|', '*', '='))).map(_.mkString))
  private val token: Gen[String] = Gen.frequency(
    6 -> junk,
    3 -> Gen.oneOf("ARRAY", "MAP", "array", "Map", "JSON_OBJECT", "VALUE",
      "KEY", "UNNEST", "JOIN", "SELECT", "FROM t", "AS x", "ON TRUE"),
    2 -> Gen.oneOf("'ARRAY[1]'", "\"MAP[2]\"", "`weird [id]`", "'it''s'",
      "ARRAY[1, 2]", "MAP['k', 1]", "JSON_OBJECT('k' VALUE 1)",
      "UNNEST(arr)", "(a, b)", "[9]"))
  private val stmt: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, token).map(_.mkString(" ")))

  test("bracket constructors: identity without a trigger, total with one") {
    val trigger = raw"(?is)\b(ARRAY|MAP)\s*\[".r
    forAllSeeded(stmt, 600) { s =>
      try {
        val out = BracketConstructors.rewrite(s)
        if (trigger.findFirstIn(s).isEmpty)
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case e: IllegalArgumentException =>
          assert(trigger.findFirstIn(s).isDefined,
            s"threw on a trigger-free statement <$s>: ${e.getMessage}")
      }
    }
  }

  test("JSON_OBJECT rewrite: identity without a trigger, total with one") {
    forAllSeeded(stmt, 600) { s =>
      try {
        val out = JsonObjectRewrite.rewrite(s)
        if (!JsonObjectRewrite.containsClause(s))
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case _: IllegalArgumentException =>
          assert(raw"(?i)JSON_OBJECT".r.findFirstIn(s).isDefined,
            s"threw on a statement without JSON_OBJECT: <$s>")
      }
    }
  }

  test("PREV/NEXT DEFINE rewrite: identity without a trigger, total with one") {
    val vars = Set("A", "B")
    // triggers: a nav call, or a pattern variable's dot-qualifier
    val trigger = raw"(?i)(\b(PREV|NEXT)\s*\(|\b(A|B)\s*\.)".r
    val defToken: Gen[String] = Gen.frequency(
      6 -> junk,
      3 -> Gen.oneOf("PREV", "NEXT", "prev(", "A.", "B .", "value", "< 10",
        "PREV(value)", "NEXT(value, 2)", "PREV(A.value)", "B.value",
        "PREV(PREV(x))", "PREV(value, k)", "'PREV(x)'", "\"A.b\"", "`B.c`"))
    val defBody: Gen[String] =
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, defToken).map(_.mkString(" ")))
    forAllSeeded(defBody, 600) { s =>
      try {
        val (out, navs) = graft.plans.MatchRecognize.rewriteNav(Map("A" -> s), vars)
        if (trigger.findFirstIn(s).isEmpty) {
          assert(out("A") == s, s"altered a trigger-free DEFINE: <$s> -> <${out("A")}>")
          assert(navs.isEmpty)
        }
      } catch {
        case e: IllegalArgumentException =>
          assert(trigger.findFirstIn(s).isDefined,
            s"threw on a trigger-free DEFINE <$s>: ${e.getMessage}")
      }
    }
  }

  test("temporal-function rewrite: identity without a trigger, total with one") {
    val spark = TestSpark.spark
    graft.plans.TemporalFunctions.register(spark, "fz_rates", "fz_rates_t",
      timeAttr = "rts", primaryKey = Seq("ccy"))
    val tfToken: Gen[String] = Gen.frequency(
      5 -> junk,
      4 -> Gen.oneOf("LATERAL TABLE", ", LATERAL TABLE (fz_rates(o.ts))",
        ", LATERAL TABLE (nope(o.ts))", "LATERAL TABLE (fz_rates(", "AS r",
        "', LATERAL TABLE (fz_rates(o.ts))'",
        "AS r (a, b)", "(o.ts)", "FROM t", "'LATERAL TABLE'"))
    val tfStmt: Gen[String] =
      Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, tfToken).map(_.mkString(" ")))
    forAllSeeded(tfStmt, 400) { s =>
      try {
        val out = graft.plans.TemporalFunctions.rewrite(spark, s)
        if (!graft.plans.TemporalFunctions.containsClause(s))
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case _: IllegalArgumentException =>
          assert(graft.plans.TemporalFunctions.containsClause(s),
            s"threw on a trigger-free statement <$s>")
      }
    }
  }

  test("MATCH_RECOGNIZE extraction/parse: clean rejection, never a crash") {
    val spark = TestSpark.spark
    spark.range(3).selectExpr("id AS k", "id AS ord", "'a' AS sym")
      .createOrReplaceTempView("fuzz_mr_t")
    val mrToken: Gen[String] = Gen.frequency(
      5 -> junk,
      4 -> Gen.oneOf("MATCH_RECOGNIZE", "MATCH_RECOGNIZE (", "PARTITION BY k",
        "ORDER BY ord", "PATTERN (A)", "PATTERN (A B+", "DEFINE A AS sym = 'a'",
        "DEFINE", "MEASURES SUM(A.x) AS s", "SUBSET U = (A", "WITHIN 5",
        "AFTER MATCH SKIP TO", "ALL ROWS PER MATCH", "PERMUTE(A, B)",
        "PREV(", "NEXT(value, 2)", "A??", "{2,}"),
      2 -> Gen.oneOf("SELECT * FROM fuzz_mr_t", ") AS m", "(A|B)", "'lit (' ",
        "FROM fuzz_mr_t"))
    val mrStmt: Gen[String] =
      Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, mrToken).map(_.mkString(" ")))
    forAllSeeded(mrStmt, 400) { s =>
      try { graft.plans.MatchRecognize.sql(spark, s); () }
      catch {
        case _: IllegalArgumentException => // the subset's own clean rejection
        case _: org.apache.spark.sql.AnalysisException => // plain-SQL fallthrough
        case e: Throwable =>
          fail(s"unclean failure ${e.getClass.getName} on <$s>: ${e.getMessage}")
      }
    }
  }

  test("window-TVF rewrite: identity without a trigger, total with one") {
    import graft.plans.WindowTvf
    val tvfToken: Gen[String] = Gen.frequency(
      5 -> junk,
      4 -> Gen.oneOf("TABLE(", "TUMBLE(", "TABLE(TUMBLE(", "TABLE ( HOP (",
        "TABLE(CUMULATE(", "TABLE(SESSION(", "TABLE t", "DESCRIPTOR(ts)",
        "DESCRIPTOR(", "INTERVAL '5' MINUTE", "INTERVAL 'x' MINUTE",
        "DATA => TABLE t", "TIMECOL => DESCRIPTOR(ts)", "SIZE =>",
        "SIZE => INTERVAL '10' MINUTE", "PARTITION BY k", "))", ")",
        "'TABLE(TUMBLE('", "GROUP BY window_start"),
      2 -> Gen.oneOf(
        "TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '5' MINUTE))",
        "TABLE(HOP(TABLE t, DESCRIPTOR(ts), INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))",
        "TABLE(SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts), INTERVAL '5' MINUTE))"))
    val tvfStmt: Gen[String] =
      Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, tvfToken).map(_.mkString(" ")))
    forAllSeeded(tvfStmt, 600) { s =>
      try {
        val out = WindowTvf.rewrite(s)
        if (!WindowTvf.containsClause(s))
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case _: IllegalArgumentException =>
          assert(WindowTvf.containsClause(s),
            s"threw on a trigger-free statement: <$s>")
        case e: Throwable =>
          fail(s"unclean failure ${e.getClass.getName} on <$s>: ${e.getMessage}")
      }
    }
  }

  test("legacy group-window rewrite: identity without a trigger, total with one") {
    import graft.plans.LegacyGroupWindow
    val lgwToken: Gen[String] = Gen.frequency(
      5 -> junk,
      4 -> Gen.oneOf("GROUP BY", "GROUP BY TUMBLE(", "TUMBLE(ts, INTERVAL '5' MINUTE)",
        "HOP(ts, INTERVAL '1' MINUTE, INTERVAL '5' MINUTE)",
        "SESSION(ts, INTERVAL '30' SECOND)", "TUMBLE_START(ts, INTERVAL '5' MINUTE)",
        "TUMBLE_ROWTIME(ts, INTERVAL '5' MINUTE)", "HOP_END(", "SESSION_PROCTIME(ts)",
        "FROM t", "FROM (SELECT", "SELECT count(*)", "HAVING", "ORDER BY k",
        "'GROUP BY TUMBLE('", ", k", "))"),
      2 -> Gen.oneOf(
        "SELECT k, count(*) FROM t GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE), k",
        "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) FROM t GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)"))
    val lgwStmt: Gen[String] =
      Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, lgwToken).map(_.mkString(" ")))
    forAllSeeded(lgwStmt, 600) { s =>
      try {
        val out = LegacyGroupWindow.rewrite(s)
        if (!LegacyGroupWindow.containsClause(s))
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case _: IllegalArgumentException =>
          assert(LegacyGroupWindow.containsClause(s),
            s"threw on a trigger-free statement: <$s>")
        case e: Throwable =>
          fail(s"unclean failure ${e.getClass.getName} on <$s>: ${e.getMessage}")
      }
    }
  }

  test("UNNEST rewrite: identity without a trigger, total with one") {
    forAllSeeded(stmt, 600) { s =>
      try {
        val out = UnnestRewrite.rewrite(s)
        if (!UnnestRewrite.containsClause(s))
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case _: IllegalArgumentException =>
          assert(raw"(?i)UNNEST".r.findFirstIn(s).isDefined,
            s"threw on a statement without UNNEST: <$s>")
      }
    }
  }

  // ---- streaming OVER parse (round-12 widened surface: LAG/LEAD,
  // DISTINCT, STDDEV/VAR family, RANGE-UNBOUNDED peer frames) ----
  private val overFrag: Gen[String] = Gen.frequency(
    4 -> junk,
    4 -> Gen.oneOf("SELECT", "FROM src", "event_id", "user_id,", "ts",
      "OVER", "OVER (", "OVER w", "WINDOW w AS (", ")", "PARTITION BY",
      "ORDER BY ts", "ORDER BY ts,", "ASC", "DESC",
      // columns embedding FROM with `_` boundaries must never be taken for
      // the top-level FROM token (round-13 DATE-splice regression)
      "valid_from", "from_city,", "valid_from,", "sum(from_qty)",
      "min(valid_from)", "lag(from_city)"),
    4 -> Gen.oneOf("sum(v)", "avg(v)", "count(*)", "count(1)", "count(v)",
      "min(v)", "max(v)", "first_value(v)", "last_value(v)", "row_number()",
      "lag(v)", "lag(v, 2)", "lag(v, 0)", "lag(v, x)", "lead(v)",
      "sum(DISTINCT v)", "count(DISTINCT v)", "avg(DISTINCT v)",
      "min(DISTINCT v)", "stddev(v)", "stddev_pop(v)", "var_samp(v)",
      "variance(DISTINCT v)", "median(v)", "lag(DISTINCT v)"),
    3 -> Gen.oneOf(
      "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "RANGE BETWEEN INTERVAL '1' MINUTE PRECEDING AND CURRENT ROW",
      "RANGE BETWEEN INTERVAL 'x' EON PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING"))
  private val overStmt: Gen[String] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, overFrag).map(_.mkString(" ")))

  test("streaming OVER parse is total: a Spec or a typed rejection, never a crash") {
    forAllSeeded(overStmt, 800) { s =>
      try { graft.plans.RowtimeOver.parse(s); () }
      catch { case _: IllegalArgumentException => () }
      // anything else (NPE, index error, regex blowup) fails the test
    }
  }

  test("named-args rewrite: identity without a trigger, total with one") {
    val spark = TestSpark.spark
    graft.functions.FunctionParams.put(spark, "ffz", Some(Seq("aa", "bb")))
    graft.functions.FunctionParams.put(spark, "fnp", None) // no -parameters
    val naToken: Gen[String] = Gen.frequency(
      5 -> junk,
      4 -> Gen.oneOf("ffz(", "fnp(", "other(", ")", "aa => 1", "bb => 'x'",
        "aa=>", "=>", "bb => ffz(aa => 2, bb => 3)", ",", "SELECT", "FROM t",
        "'a => b'", "ffz(aa => 1, bb => 2)", "ffz(1, 2)", "ffz(aa => 1, 2)",
        "ffz(cc => 1, dd => 2)", "fnp(aa => 1)",
        "'ffz(aa => 1, bb => 2)'", "\"ffz(bb => 2, aa => 1)\"",
        "'it''s'", "'esc\\''"))
    val naStmt: Gen[String] =
      Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, naToken).map(_.mkString(" ")))
    forAllSeeded(naStmt, 800) { s =>
      try {
        val out = graft.plans.NamedArgs.rewrite(spark, s)
        if (!graft.plans.NamedArgs.containsClause(s))
          assert(out == s, s"altered a trigger-free statement: <$s> -> <$out>")
      } catch {
        case _: IllegalArgumentException => () // clean rejection
        case e: Throwable =>
          fail(s"unclean failure ${e.getClass.getName} on <$s>: ${e.getMessage}")
      }
    }
    // the canonical mappings hold under fuzz-adjacent shapes
    assert(graft.plans.NamedArgs.rewrite(spark,
      "SELECT ffz(bb => 'y', aa => 1 + 2) FROM t") ==
      "SELECT ffz(1 + 2, 'y') FROM t")
    assert(graft.plans.NamedArgs.rewrite(spark,
      "SELECT ffz(bb => ffz(bb => 'i', aa => 0), aa => 9) FROM t") ==
      "SELECT ffz(9, ffz(0, 'i')) FROM t")
    // a registered invocation INSIDE a string literal is data, not a
    // call site: byte-identical pass-through (quote-aware scan), for
    // single- and double-quoted literals alike
    Seq("SELECT 'see ffz(aa => 1, bb => 2)' FROM t",
        "SELECT \"ffz(bb => 2, aa => 1)\" AS s FROM t",
        "SELECT 'it''s ffz(aa => 1, bb => 2)' FROM t").foreach { s =>
      assert(graft.plans.NamedArgs.rewrite(spark, s) == s, s"literal rewritten: $s")
    }
    // mixed: the literal occurrence stays verbatim while the real
    // invocation next to it still normalizes (escaped quote in an arg)
    assert(graft.plans.NamedArgs.rewrite(spark,
      "SELECT 'ffz(bb => 0, aa => 0)', ffz(bb => 'it''s', aa => 1) FROM t") ==
      "SELECT 'ffz(bb => 0, aa => 0)', ffz(1, 'it''s') FROM t")
    graft.functions.FunctionParams.remove(spark, "ffz")
    graft.functions.FunctionParams.remove(spark, "fnp")
  }

  test("shared argument splitter: double-quoted literals and escaped quotes never split") {
    def st(s: String) = graft.plans.NamedArgs.splitTopLevel(s)
    assert(st("\"a,b\", 2") == Seq("\"a,b\"", "2"))
    assert(st("'it\\'s, x', 2") == Seq("'it\\'s, x'", "2"))
    assert(st("'it''s, x', 2") == Seq("'it''s, x'", "2"))
    assert(st("\"d,\"\"q\", 'e'") == Seq("\"d,\"\"q\"", "'e'"))
    assert(st("f(1, 2), [3, 4]") == Seq("f(1, 2)", "[3, 4]"))
    assert(st("") == Seq.empty && st("  ") == Seq.empty)
  }

  test("streaming OVER parse: columns embedding FROM never truncate the select list") {
    // `valid_from` / `from_city` contain FROM at `_` word boundaries; the
    // top-level FROM scanner must skip them (round-13 DATE-splice regression:
    // the date_from_unix_date splice was taken for the FROM clause).
    val specs = Seq(
      "SELECT event_id, valid_from, sum(v) OVER w FROM src " +
        "WINDOW w AS (PARTITION BY valid_from ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
      "SELECT from_city, event_id, min(v) OVER w FROM src " +
        "WINDOW w AS (PARTITION BY from_city ORDER BY ts " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)")
    specs.foreach { s =>
      val spec = graft.plans.RowtimeOver.parse(s)
      assert(spec.idCol == "event_id", s"wrong id column for <$s>: ${spec.idCol}")
    }
  }
}
