package graft.plans

/** SQL/JSON `JSON_OBJECT([KEY] 'k' VALUE expr, ...)` → Spark's
  * `to_json(named_struct('k', expr, ...))` ([U] flink-sql-parser
  * SqlJsonObjectFunction; the KEY/VALUE clause is parser grammar, so no
  * FunctionRegistry builder can accept it).
  *
  * ON NULL semantics follow the standard: the bare form and an explicit
  * `NULL ON NULL` emit JSON nulls (to_json with ignoreNullFields=false —
  * the SQL-standard/Flink default for JSON_OBJECT), while `ABSENT ON
  * NULL` drops null-valued keys (to_json's plain omission). Delta,
  * documented: keys must be string literals (named_struct's
  * requirement — the overwhelmingly common form).
  */
object JsonObjectRewrite {

  private val callRe = raw"(?is)\bJSON_OBJECT\s*\(".r
  private val pairRe = raw"(?is)^(?:KEY\s+)?(.+?)\s+VALUE\s+(.+)$$".r
  private val onNullRe = raw"(?is)\s+(?:NULL|ABSENT)\s+ON\s+NULL\s*$$".r

  def containsClause(sqlText: String): Boolean =
    callRe.findFirstIn(sqlText).isDefined &&
      raw"(?is)\bVALUE\b".r.findFirstIn(sqlText).isDefined

  def rewrite(sql: String): String = {
    val m = callRe.findFirstMatchIn(sql).getOrElse(return sql)
    val open = m.end - 1
    val close = WindowTvf.matchParen(sql, open)
    val bodyRaw = sql.substring(open + 1, close)
    val absent =
      raw"(?is)\s+ABSENT\s+ON\s+NULL\s*$$".r.findFirstIn(bodyRaw).isDefined
    val body = onNullRe.replaceFirstIn(bodyRaw, "")
    val args = WindowTvf.splitArgs(body)
    val rewritten =
      if (args.forall(pairRe.findFirstIn(_).isDefined)) {
        val pairs = args.map { a =>
          val pm = pairRe.findFirstMatchIn(a).get
          s"${pm.group(1)}, ${rewrite(pm.group(2))}" // nested calls recurse
        }
        val opts = if (absent) "" else ", map('ignoreNullFields', 'false')"
        s"to_json(named_struct(${pairs.mkString(", ")})$opts)"
      } else sql.substring(m.start, close + 1) // not KEY/VALUE form: untouched
    sql.substring(0, m.start) + rewritten + rewrite(sql.substring(close + 1))
  }
}
