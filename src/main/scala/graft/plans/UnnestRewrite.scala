package graft.plans

/** Flink SQL's `UNNEST` join surface ([U] flink-table-planner
  * SqlUnnestOperator / logical LogicalCorrelate over UnnestRowsFunction;
  * SURVEY.md §2.9 UDTF/explode):
  *
  * {{{
  * SELECT o.id, t.tag
  * FROM orders AS o
  * CROSS JOIN UNNEST(o.tags) AS t (tag)
  * }}}
  *
  * Rewritten textually onto Spark's LATERAL VIEW generators — the same
  * correlate shape Catalyst plans for Flink's operator — so the
  * statement stays one declarative plan (generator inside whole-stage
  * codegen, no shuffle added):
  *
  *  - `CROSS JOIN UNNEST(e) AS t (c)` → `LATERAL VIEW explode(e) t AS c`
  *    (array of scalars, one output column);
  *  - `CROSS JOIN UNNEST(e) AS t (a, b, ...)` → `LATERAL VIEW inline(e)
  *    t AS a, b, ...` (array of ROW — Flink flattens the fields, as
  *    does inline);
  *  - `LEFT [OUTER] JOIN UNNEST(e) AS t (...) ON TRUE` → `LATERAL VIEW
  *    OUTER ...` (empty/NULL collections keep the left row with nulls,
  *    Flink's ON TRUE left-correlate semantics).
  *
  * Documented delta: Flink's MAP unnest (`UNNEST(m)` → key/value rows)
  * is expressed as `UNNEST(map_entries(m)) AS t (key, value)` — the
  * expression inside UNNEST passes through verbatim, so Spark's
  * map_entries composes, and the 2-column form lands on `inline` over
  * its entry structs.
  */
object UnnestRewrite {

  private val clauseRe =
    raw"(?is)\b(CROSS\s+JOIN|LEFT\s+(?:OUTER\s+)?JOIN)\s+UNNEST\s*\(".r
  private val tailRe =
    (raw"(?is)^\s*(?:AS\s+)?([A-Za-z_]\w*)\s*\(\s*" +
     raw"([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)(\s+ON\s+TRUE)?").r

  def containsClause(sqlText: String): Boolean =
    clauseRe.findFirstIn(sqlText).isDefined

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"UNNEST: $msg")

  /** Replace every UNNEST join clause in the statement (left to right;
    * nested parens inside the UNNEST argument are respected).
    */
  def rewrite(sqlText: String): String = {
    var s = sqlText
    var m = clauseRe.findFirstMatchIn(s)
    while (m.isDefined) {
      val mm = m.get
      val open = mm.end - 1
      val close = WindowTvf.matchParen(s, open)
      val expr = s.substring(open + 1, close).trim
      val rest = s.substring(close + 1)
      val t = tailRe.findFirstMatchIn(rest).getOrElse(fail(
        "UNNEST must be followed by an alias and column list: " +
          "... JOIN UNNEST(expr) AS t (c1[, c2...]) — got: " + rest.take(60)))
      val isLeft = mm.group(1).toUpperCase.startsWith("LEFT")
      if (isLeft && t.group(3) == null)
        fail("LEFT JOIN UNNEST requires ON TRUE (Flink's left-correlate form)")
      val cols = t.group(2).split(",").map(_.trim)
      val generator = if (cols.length == 1) "explode" else "inline"
      val outer = if (isLeft) "OUTER " else ""
      val replacement =
        s" LATERAL VIEW $outer$generator($expr) ${t.group(1)} AS ${cols.mkString(", ")} "
      s = s.substring(0, mm.start) + replacement + rest.substring(t.end)
      m = clauseRe.findFirstMatchIn(s)
    }
    s
  }
}
