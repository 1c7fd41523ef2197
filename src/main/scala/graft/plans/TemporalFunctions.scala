package graft.plans

import org.apache.spark.sql.SparkSession

/** Legacy temporal table FUNCTIONS ([U] flink-table-api
  * TemporalTableFunction / flink-docs "Temporal Table Function" — the
  * pre-`FOR SYSTEM_TIME` temporal-join surface):
  *
  * {{{
  *   TemporalFunctions.register(spark, "rates", "rates_history",
  *     timeAttr = "rate_ts", primaryKey = Seq("currency"))
  *   FlinkSql.sql(spark, """
  *     SELECT o.amount * r.rate
  *     FROM orders AS o, LATERAL TABLE (rates(o.order_ts)) AS r
  *     WHERE r.currency = o.currency""")
  * }}}
  *
  * `LATERAL TABLE (fn(t))` is the version of the history table valid at
  * time `t`: per primary key, the row with the greatest time attribute
  * ≤ t. The rewrite derives validity INTERVALS once (`lead(timeAttr)
  * OVER (PARTITION BY pk ORDER BY timeAttr)` as the exclusive end) and
  * replaces the correlated call with a plain range join — no correlated
  * subquery, so Catalyst needs no decorrelation, and when the user's
  * WHERE carries the usual key equation (`r.currency = o.currency`) the
  * optimizer folds it into the join, making it an equi+range as-of join
  * exactly like [[SystemTimeJoin]]'s plan. Subset notes: the comma-join
  * form only (Flink's documented shape); the function alias exposes one
  * internal `__v_to` column (the validity end) alongside the table's
  * own; a column-list alias `AS r (a, b)` is rejected loudly. The SQL
  * form is BATCH-only (the validity-interval window cannot run on an
  * unbounded stream) — streaming temporal joins use
  * [[graft.streaming.TemporalJoin]] or `FOR SYSTEM_TIME AS OF`.
  */
object TemporalFunctions {

  private case class TemporalFn(table: String, timeAttr: String, pk: Seq[String])

  private val registry =
    new java.util.WeakHashMap[SparkSession, Map[String, TemporalFn]]()

  /** Register `name` as a temporal table function over `table` (a table
    * or view name), versioned by `timeAttr` per `primaryKey`.
    */
  def register(spark: SparkSession, name: String, table: String,
      timeAttr: String, primaryKey: Seq[String]): Unit = registry.synchronized {
    require(primaryKey.nonEmpty, "temporal table function needs a primary key")
    val cur = Option(registry.get(spark)).getOrElse(Map.empty)
    registry.put(spark, cur + (name.toLowerCase -> TemporalFn(table, timeAttr, primaryKey)))
  }

  private def registered(spark: SparkSession): Map[String, TemporalFn] =
    registry.synchronized(Option(registry.get(spark)).getOrElse(Map.empty))

  def containsClause(sqlText: String): Boolean =
    raw"(?i)\bLATERAL\s+TABLE\b".r.findFirstIn(masked(sqlText)).isDefined

  /** Index-preserving shadow with quoted-literal INTERIORS blanked, so
    * regex matching never triggers on `'... LATERAL TABLE ...'` text
    * while offsets stay valid against the real string.
    */
  private def masked(s: String): String = {
    val b = new StringBuilder(s)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val end = BracketConstructors.endOfLiteral(s, i)
        var k = i + 1
        while (k < end - 1) { b.setCharAt(k, ' '); k += 1 }
        i = end
      } else i += 1
    }
    b.toString
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"LATERAL TABLE subset: $msg")

  /** Rewrite every `, LATERAL TABLE (fn(expr)) [AS alias]` whose `fn` is
    * registered into the validity-interval range join. Unregistered
    * names fail loudly (a UDTF-style LATERAL TABLE is the UNNEST
    * rewrite's domain and uses Spark's own LATERAL VIEW after
    * migration).
    */
  def rewrite(spark: SparkSession, sqlText: String): String = {
    val fns = registered(spark)
    // comma form (CROSS APPLY), or — bridged UDTFs only — Flink's
    // `LEFT [OUTER] JOIN LATERAL TABLE(f(x)) AS T(c) ON TRUE` (the
    // keep-empty-emissions form, lowered onto LATERAL VIEW OUTER)
    // comma form tolerates zero whitespace (`FROM t,LATERAL TABLE(...)`
    // is valid Flink SQL); the keyword form still requires a separator
    val callRe =
      raw"(?is)(,\s*|\bLEFT\s+(?:OUTER\s+)?JOIN\s+)LATERAL\s+TABLE\s*\(\s*([A-Za-z_]\w*)\s*\(".r
    var out = sqlText
    var m = callRe.findFirstMatchIn(masked(out))
    var guard = 0
    while (m.isDefined && guard < 64) {
      guard += 1
      val mm = m.get
      val isOuter = !mm.group(1).startsWith(",")
      val name = mm.group(2).toLowerCase
      val fnOpt = fns.get(name)
      // a name registered through the reflective TABLE-function bridge
      // (CREATE FUNCTION over a TableFunction-shaped class) lowers onto
      // Spark's own generator path instead of the validity-range join
      val isUdtf = fnOpt.isEmpty &&
        graft.functions.ReflectiveTable.isTableFunction(spark, name)
      if (fnOpt.isEmpty && !isUdtf)
        fail(s"no temporal table function named ${mm.group(2)} is registered " +
          "(TemporalFunctions.register), and no table function of that name " +
          "is bridged (CREATE FUNCTION over a TableFunction-shaped class)")
      if (isOuter && !isUdtf)
        fail(s"LEFT JOIN LATERAL TABLE(${mm.group(2)}(...)) ON TRUE applies " +
          "to bridged table functions; a temporal table function uses the " +
          "comma-join form")
      // balanced argument span from the inner open paren (quote-aware)
      val argStart = mm.end
      var i = argStart
      var depth = 1
      val n = out.length
      while (i < n && depth > 0) {
        out.charAt(i) match {
          case '\'' | '"' | '`' => i = BracketConstructors.endOfLiteral(out, i) - 1
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      if (depth != 0) fail(s"unbalanced parens in LATERAL TABLE ($name(...))")
      val arg = out.substring(argStart, i - 1).trim
      if (arg.isEmpty) fail(s"$name(...) needs a time argument")
      // the outer `)` closing LATERAL TABLE ( ... )
      var j = i
      while (j < n && out.charAt(j).isWhitespace) j += 1
      if (j >= n || out.charAt(j) != ')')
        fail(s"expected `)` closing LATERAL TABLE ($name(...))")
      j += 1
      val replacementAndEnd: (String, Int) =
        if (isUdtf) {
          // `, LATERAL TABLE (f(args)) AS t (c)` → ` LATERAL VIEW
          // explode(f(args)) t AS c` — the bridged UDF returns ARRAY<T>,
          // so the fan-out is Spark's codegen'd Generate. The column
          // list names the ONE output column (the bridge's declared
          // single-scalar row subset).
          // one column → explode (scalar rows); several → inline (the
          // bridge emits ARRAY<STRUCT> for POJO rows)
          val colsPat = raw"([A-Za-z_]\w*)\s*\(\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)"
          val udtfAliasRe =
            if (isOuter) raw"(?is)^\s+AS\s+$colsPat\s+ON\s+TRUE".r
            else raw"(?is)^\s+AS\s+$colsPat".r
          udtfAliasRe.findFirstMatchIn(out.substring(j)) match {
            case Some(am) =>
              val cols = am.group(2).split(",").map(_.trim)
              val gen = if (cols.length == 1) "explode" else "inline"
              val outer = if (isOuter) "OUTER " else ""
              (s" LATERAL VIEW $outer$gen(${mm.group(2)}($arg)) ${am.group(1)} " +
                s"AS ${cols.mkString(", ")}", j + am.end)
            case None if isOuter =>
              fail(s"LEFT JOIN LATERAL TABLE($name(...)) needs " +
                "`AS alias(col, ...) ON TRUE` (Flink's literal-TRUE join condition)")
            case None =>
              fail(s"LATERAL TABLE($name(...)) over a bridged table function " +
                "needs `AS alias(col, ...)` — named output columns")
          }
        } else {
          val fn = fnOpt.get
          // optional `AS alias`; a column list is out of the subset
          val aliasRe = raw"(?is)^\s+AS\s+([A-Za-z_]\w*)(\s*\()?".r
          val (alias, end) = aliasRe.findFirstMatchIn(out.substring(j)) match {
            case Some(am) if am.group(2) != null =>
              fail("a column-list alias on a temporal LATERAL TABLE is not in " +
                "the subset (alias the columns in the SELECT instead)")
            case Some(am) => (am.group(1), j + am.end)
            case None     => (name, j)
          }
          val versions =
            s"(SELECT *, lead(${fn.timeAttr}) OVER (PARTITION BY ${fn.pk.mkString(", ")} " +
              s"ORDER BY ${fn.timeAttr}) AS __v_to FROM ${fn.table})"
          (s" JOIN $versions AS $alias ON ($arg) >= $alias.${fn.timeAttr} " +
            s"AND ($alias.__v_to IS NULL OR ($arg) < $alias.__v_to)", end)
        }
      val (replacement, end) = replacementAndEnd
      out = out.substring(0, mm.start) + replacement + out.substring(end)
      m = callRe.findFirstMatchIn(masked(out))
    }
    if (containsClause(out))
      fail("only the comma-join form `FROM t, LATERAL TABLE (fn(expr))` is " +
        "supported — fn a registered temporal table function " +
        "(TemporalFunctions.register) or a table function bridged by " +
        "CREATE FUNCTION; other LATERAL TABLE shapes migrate to Spark's " +
        "LATERAL VIEW explode/inline")
    out
  }
}
