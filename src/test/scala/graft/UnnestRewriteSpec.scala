package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.UnnestRewrite

/** Flink's UNNEST join surface (graft.plans.UnnestRewrite; SURVEY.md
  * §2.9): CROSS/LEFT JOIN UNNEST lowers onto LATERAL VIEW generators —
  * explode for scalar arrays, inline for arrays of ROW, OUTER for the
  * ON TRUE left-correlate form, map_entries composition for maps.
  */
class UnnestRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rewrite shapes: explode / inline / OUTER; errors outside the subset") {
    val one = UnnestRewrite.rewrite(
      "SELECT id, t.x FROM src CROSS JOIN UNNEST(arr) AS t (x)")
    assert(one.contains("LATERAL VIEW explode(arr) t AS x"))
    val rows = UnnestRewrite.rewrite(
      "SELECT id, t.a, t.b FROM src CROSS JOIN UNNEST(pairs) AS t (a, b)")
    assert(rows.contains("LATERAL VIEW inline(pairs) t AS a, b"))
    val outer = UnnestRewrite.rewrite(
      "SELECT id, t.x FROM src LEFT JOIN UNNEST(arr) AS t (x) ON TRUE")
    assert(outer.contains("LATERAL VIEW OUTER explode(arr) t AS x"))
    // nested parens inside the UNNEST argument are respected
    val nested = UnnestRewrite.rewrite(
      "SELECT t.x FROM src CROSS JOIN UNNEST(split(s, '(')) AS t (x)")
    assert(nested.contains("explode(split(s, '(')) t AS x"))
    // LEFT JOIN UNNEST without ON TRUE is outside Flink's form
    val e = intercept[IllegalArgumentException] {
      UnnestRewrite.rewrite("SELECT 1 FROM src LEFT JOIN UNNEST(arr) AS t (x)")
    }
    assert(e.getMessage.contains("ON TRUE"))
    assert(!UnnestRewrite.containsClause("SELECT unnest FROM t"))
    // chained unnests in one statement all rewrite (left to right)
    val two = UnnestRewrite.rewrite(
      "SELECT t.x, u.y FROM src CROSS JOIN UNNEST(a) AS t (x) CROSS JOIN UNNEST(b) AS u (y)")
    assert(two.contains("explode(a) t AS x") && two.contains("explode(b) u AS y"))
  }

  test("array / row / map unnest end-to-end through FlinkSql") {
    import spark.implicits._
    Seq((1L, Seq("a", "b"), Map("k1" -> 10, "k2" -> 20)),
        (2L, Seq("c"), Map("k3" -> 30)),
        (3L, Seq.empty[String], Map.empty[String, Int]))
      .toDF("id", "tags", "m").createOrReplaceTempView("un_src")
    // CROSS JOIN UNNEST drops empty collections (inner correlate)
    val cross = FlinkSql.sql(spark,
      """SELECT u.id, t.tag FROM un_src AS u
        |CROSS JOIN UNNEST(u.tags) AS t (tag)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cross == Set((1L, "a"), (1L, "b"), (2L, "c")))
    // LEFT JOIN ... ON TRUE keeps the empty row with a null tag
    val left = FlinkSql.sql(spark,
      """SELECT u.id, t.tag FROM un_src AS u
        |LEFT JOIN UNNEST(u.tags) AS t (tag) ON TRUE""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(left == Set((1L, Some("a")), (1L, Some("b")), (2L, Some("c")), (3L, None)))
    // MAP unnest: Flink's key/value rows via map_entries composition
    val map = FlinkSql.sql(spark,
      """SELECT u.id, t.k, t.v FROM un_src AS u
        |CROSS JOIN UNNEST(map_entries(u.m)) AS t (k, v)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(map == Set((1L, "k1", 10), (1L, "k2", 20), (2L, "k3", 30)))
    // array-of-ROW flattens fields (inline), Flink's multi-column unnest
    Seq((1L, Seq(("x", 1), ("y", 2)))).toDF("id", "pairs")
      .createOrReplaceTempView("un_rows")
    val rows = FlinkSql.sql(spark,
      """SELECT u.id, t.name, t.rank FROM un_rows AS u
        |CROSS JOIN UNNEST(u.pairs) AS t (name, rank)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set((1L, "x", 1), (1L, "y", 2)))
    // the generator stays codegen-resident (correlate, no shuffle added)
    val plan = FlinkSql.sql(spark,
      "SELECT t.tag FROM un_src CROSS JOIN UNNEST(tags) AS t (tag)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode") && !plan.contains("Exchange"), plan)
  }
}
