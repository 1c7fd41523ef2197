package graft.plans

/** Flink 1.x legacy group-window SQL — the pre-TVF syntax that every
  * long-lived Flink pipeline still carries
  * ([U] flink-table-planner SqlStdOperatorTable TUMBLE/HOP/SESSION group
  * functions + auxiliary `<fn>_START`/`<fn>_END`/`<fn>_ROWTIME`;
  * deprecated-but-supported through 1.19; SURVEY.md §2.5):
  *
  * {{{
  * SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE), k, count(*)
  * FROM t GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE), k
  *
  * SELECT HOP_END(ts, INTERVAL '1' MINUTE, INTERVAL '5' MINUTE), sum(v)
  * FROM t GROUP BY HOP(ts, INTERVAL '1' MINUTE, INTERVAL '5' MINUTE)
  *
  * SELECT SESSION_START(ts, INTERVAL '30' SECOND), k, count(*)
  * FROM t GROUP BY SESSION(ts, INTERVAL '30' SECOND), k
  * }}}
  *
  * Pure text→text rewrite that lowers onto the window-TVF form and lets
  * [[WindowTvf]] finish the job: the single-table FROM becomes
  * `TABLE(<fn>(TABLE t, DESCRIPTOR(ts), ...))`, the group-window key in
  * GROUP BY becomes `window_start, window_end`, and the auxiliary
  * selectors become the TVF's `window_start` / `window_end` columns
  * (`<fn>_ROWTIME` maps to `window_end - INTERVAL '1' MILLISECOND`,
  * Flink's max-timestamp rowtime; `<fn>_PROCTIME` has no batch meaning
  * and fails). SESSION's implicit per-key scoping is reproduced by
  * passing the remaining GROUP BY keys as the TVF's PARTITION BY list.
  *
  * Subset (clear error outside it): one group window per statement; the
  * FROM clause must be a single table/view name (derived tables can
  * pre-compose a temp view); auxiliary selectors must repeat the group
  * window's arguments verbatim, as Flink requires.
  */
object LegacyGroupWindow {

  private val groupByRe = raw"(?is)\bGROUP\s+BY\b".r
  private val winFnRe = raw"(?is)^(TUMBLE|HOP|SESSION)\s*\(".r
  private val auxRe = raw"(?is)\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME|PROCTIME)\s*\(".r
  private val fromRe = raw"(?is)\bFROM\s+([A-Za-z_][\w.]*)".r
  private val identRe = raw"(?is)^[A-Za-z_]\w*$$".r

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"legacy group window: $msg")

  /** True iff a GROUP BY clause contains a bare TUMBLE/HOP/SESSION call
    * (the TVF form wraps them in `TABLE(...)` and never lands in GROUP BY,
    * so the two dialect layers cannot both claim a statement).
    */
  def containsClause(sqlText: String): Boolean =
    groupByRe.findAllMatchIn(sqlText).exists { m =>
      splitTopLevel(clauseBody(sqlText, m.end)._1).exists(k => winFnRe.findFirstIn(k).isDefined)
    }

  /** The text from `from` up to the next top-level clause keyword. */
  private def clauseBody(s: String, from: Int): (String, Int) = {
    val stop = raw"(?is)\b(HAVING|ORDER\s+BY|LIMIT|WINDOW|UNION|INTERSECT|EXCEPT)\b".r
    var depth = 0
    var i = from
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          if (depth == 0) return (s.substring(from, i), i) // enclosing subquery closes
          depth -= 1
        case _ if depth == 0 =>
          val rest = s.substring(i)
          if (stop.findPrefixOf(rest).isDefined) return (s.substring(from, i), i)
        case _ =>
      }
      i += 1
    }
    (s.substring(from), s.length)
  }

  private def splitTopLevel(s: String): Seq[String] = WindowTvf.splitArgs(s)

  def rewrite(sqlText: String): String = {
    if (!containsClause(sqlText)) return sqlText
    val gb = groupByRe.findAllMatchIn(sqlText).find { m =>
      splitTopLevel(clauseBody(sqlText, m.end)._1)
        .exists(k => winFnRe.findFirstIn(k).isDefined)
    }.get
    val (body, bodyEnd) = clauseBody(sqlText, gb.end)
    val keys = splitTopLevel(body)
    val winKeys = keys.filter(k => winFnRe.findFirstIn(k).isDefined)
    if (winKeys.size != 1) fail("exactly one TUMBLE/HOP/SESSION group key is supported")
    val winKey = winKeys.head
    val m = winFnRe.findFirstMatchIn(winKey).get
    val fn = m.group(1).toUpperCase
    val close = WindowTvf.matchParen(winKey, m.end - 1)
    if (winKey.substring(close + 1).trim.nonEmpty)
      fail(s"trailing text after $fn(...) group key")
    val args = splitTopLevel(winKey.substring(m.end, close)).map(_.trim)
    val ts = args.headOption.filter(a => identRe.findFirstIn(a).isDefined)
      .getOrElse(fail(s"first arg of $fn must be the rowtime column"))
    val expectArgs = if (fn == "HOP") 3 else 2
    if (args.size != expectArgs) fail(s"$fn takes $expectArgs args (rowtime, INTERVAL...)")
    val otherKeys = keys.filterNot(_ eq winKey).map(_.trim)

    // FROM <single table> → FROM TABLE(<fn>(TABLE t, DESCRIPTOR(ts), ...))
    val fm = fromRe.findFirstMatchIn(sqlText)
      .getOrElse(fail("FROM <table> not found"))
    val table = fm.group(1)
    val after = sqlText.substring(fm.end).trim
    if (after.nonEmpty && !raw"(?is)^(WHERE|GROUP)\b".r.findPrefixOf(after).isDefined)
      fail("FROM must be a single table or view name (joins/subqueries: pre-compose a temp view)")
    val intervals = args.tail.mkString(", ")
    val tvfTable = fn match {
      case "SESSION" =>
        val part = if (otherKeys.nonEmpty) s" PARTITION BY ${otherKeys.mkString(", ")}" else ""
        s"TABLE(SESSION(TABLE $table$part, DESCRIPTOR($ts), $intervals))"
      case _ =>
        s"TABLE($fn(TABLE $table, DESCRIPTOR($ts), $intervals))"
    }

    // splice: FROM replacement first (it lies before GROUP BY), then the
    // GROUP BY key list, so the indices stay valid at each step
    val newBody = (otherKeys :+ "window_start, window_end").mkString(", ")
    var out = sqlText.substring(0, gb.end) + " " + newBody + sqlText.substring(bodyEnd)
    out = out.substring(0, fm.start) + "FROM " + tvfTable + out.substring(fm.end)

    // auxiliary selectors anywhere in the statement; Flink requires their
    // args to repeat the group window's — enforced, then dropped
    var am = auxRe.findFirstMatchIn(out)
    var guard = 0
    while (am.isDefined && guard < 64) {
      val a = am.get
      if (a.group(1).toUpperCase != fn)
        fail(s"${a.group(1)}_${a.group(2)} does not match the $fn group window")
      val aClose = WindowTvf.matchParen(out, a.end - 1)
      val aArgs = splitTopLevel(out.substring(a.end, aClose)).map(_.trim)
      if (aArgs != args)
        fail(s"${a.group(1)}_${a.group(2)} args must repeat the group window's: (${args.mkString(", ")})")
      val repl = a.group(2).toUpperCase match {
        case "START" => "window_start"
        case "END" => "window_end"
        case "ROWTIME" => "(window_end - INTERVAL '1' MILLISECOND)"
        case "PROCTIME" => fail(s"${fn}_PROCTIME has no batch equivalent")
      }
      out = out.substring(0, a.start) + repl + out.substring(aClose + 1)
      am = auxRe.findFirstMatchIn(out)
      guard += 1
    }
    out
  }
}
