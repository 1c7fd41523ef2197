package graft.plans

/** SQL-text window TVFs — the reference's windowing-TVF surface
  * ([U] flink-table-planner SqlWindowTableFunction: TUMBLE / HOP /
  * CUMULATE over `TABLE(...)` + `DESCRIPTOR(...)`; SURVEY.md §2.5):
  *
  * {{{
  * SELECT ... FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
  * SELECT ... FROM TABLE(HOP(TABLE t, DESCRIPTOR(ts), INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))
  * SELECT ... FROM TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL '2' MINUTE, INTERVAL '10' MINUTE))
  * SELECT ... FROM TABLE(SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
  * }}}
  *
  * Pure text→text rewrite: the `TABLE(WTF(...))` span becomes a
  * parenthesized subquery appending `window_start` / `window_end`
  * timestamp columns (each row replicated across its covering windows for
  * HOP/CUMULATE via `explode(sequence(...))`; SESSION assigned by a
  * gaps-and-islands window-function pass per partition key), then
  * Spark's own parser
  * takes over — bucketing stays a scalar projection + explode, so
  * grouping by (window_start, window_end, keys) is an ordinary
  * shuffle-parallel hash aggregate; nothing about the plan is custom.
  *
  * Subset notes (clear error outside it): second-or-coarser granularity
  * (intervals map to whole seconds); HOP arg order is Flink's
  * (slide, size); CUMULATE's is (step, size); TUMBLE/HOP accept the
  * optional trailing `offset` (window alignment, = Spark window()'s
  * startTime); named arguments (FLIP-387 `DATA => ... , TIMECOL => ...`) normalize to
  * positional, all-or-nothing per Flink; `window_time`
  * (the reference's window rowtime, window_end − 1 ms) IS emitted as a
  * plain column — what it cannot carry here is Spark watermark/rowtime
  * semantics (SURVEY §2.8 delta).
  * Flink window bounds are [start, end): a row at exactly `end` falls in
  * the next window, which the `div`-based bucketing reproduces.
  *
  * Streaming note: [[rewrite]] is BATCH SQL parity — Structured
  * Streaming only evicts window state for groupings built from its own
  * `window()`/`session_window()` functions, and a derived window_start
  * column cannot be watermark-tracked. Streaming INSERTs route through
  * [[rewriteStreaming]] instead (TUMBLE/HOP onto native `window()`,
  * SESSION onto native `session_window()` grouping); CUMULATE streams
  * via the CumulateOps builder.
  */
object WindowTvf {

  private val head = raw"(?is)\bTABLE\s*\(\s*(TUMBLE|HOP|CUMULATE|SESSION)\s*\(".r

  def containsClause(sqlText: String): Boolean = head.findFirstIn(sqlText).isDefined

  /** Uppercased fn name of the first window-TVF span, if any. */
  def firstSpanFn(sqlText: String): Option[String] =
    head.findFirstMatchIn(sqlText).map(_.group(1).toUpperCase)

  /** Parse the first span as CUMULATE:
    * (table, tsCol, stepSec, sizeSec, offsetSec, spanStart, spanEnd).
    * Fails (with the streaming WindowJoin guidance) on multi-span text.
    */
  private[plans] def cumulateSpan(sqlText: String): (String, String, Long, Long, Long, Int, Int) = {
    val ms = head.findAllMatchIn(sqlText).toSeq
    if (ms.size > 1)
      fail("streaming supports ONE window-TVF span per statement " +
        "(streaming window joins deploy via graft.streaming.WindowJoin)")
    val mm = ms.headOption.getOrElse(fail("no window-TVF span"))
    val innerOpen = mm.end - 1
    val innerClose = matchParen(sqlText, innerOpen)
    val afterInner = sqlText.indexWhere(!_.isWhitespace, innerClose + 1)
    if (afterInner < 0 || sqlText.charAt(afterInner) != ')')
      fail("expected `TABLE( <fn>(...) )`")
    if (mm.group(1).toUpperCase != "CUMULATE") fail("first span is not CUMULATE")
    val args = normalizeArgs("CUMULATE",
      splitArgs(sqlText.substring(innerOpen + 1, innerClose)))
    if (args.size < 4 || args.size > 5)
      fail("CUMULATE takes (TABLE t, DESCRIPTOR(ts), step, size [, offset])")
    val table = args.head match {
      case tableRe(t) => t
      case other => fail(s"first arg of CUMULATE must be TABLE <name>, got `$other`")
    }
    val ts = args(1) match {
      case descRe(c) => c
      case other => fail(s"second arg of CUMULATE must be DESCRIPTOR(<col>), got `$other`")
    }
    val st = seconds(args(2))
    val sz = seconds(args(3))
    val off = if (args.size > 4) seconds(args(4)) else 0L
    if (sz % st != 0) fail("CUMULATE size must be a multiple of step")
    (table, ts, st, sz, off, mm.start, afterInner)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"window TVF: $msg")

  private val intervalRe =
    raw"(?is)^INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?$$".r

  private def seconds(arg: String): Long = arg.trim match {
    case intervalRe(n, unit) =>
      n.toLong * (unit.toUpperCase match {
        case "SECOND" => 1L
        case "MINUTE" => 60L
        case "HOUR"   => 3600L
        case "DAY"    => 86400L
      })
    case other => fail(s"expected INTERVAL '<n>' <unit>, got `$other`")
  }

  /** Split a TVF argument list on top-level commas. */
  private[plans] def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
    }
    out += cur.result().trim
    out.result()
  }

  /** Flink 1.19 named parameters (FLIP-387: `TUMBLE(DATA => TABLE t,
    * TIMECOL => DESCRIPTOR(ts), SIZE => INTERVAL '10' MINUTE)`):
    * normalize to positional order. All-or-nothing per Flink: mixing
    * named and positional fails.
    */
  private[plans] def normalizeArgs(fn: String, args: Seq[String]): Seq[String] = {
    val namedRe = raw"(?is)^([A-Za-z_]\w*)\s*=>\s*(.*)$$".r
    val named = args.collect { case namedRe(k, v) => k.toUpperCase -> v.trim }
    if (named.isEmpty) return args
    if (named.size != args.size)
      fail(s"$fn: mix of named and positional arguments")
    val order = fn match {
      case "TUMBLE"   => Seq("DATA", "TIMECOL", "SIZE", "OFFSET")
      case "HOP"      => Seq("DATA", "TIMECOL", "SLIDE", "SIZE", "OFFSET")
      case "CUMULATE" => Seq("DATA", "TIMECOL", "STEP", "SIZE", "OFFSET")
      case "SESSION"  => Seq("DATA", "TIMECOL", "GAP")
      case other      => fail(s"unknown window TVF $other")
    }
    val m = named.toMap
    if (named.size != m.size) fail(s"$fn: duplicate named argument")
    val unknown = m.keySet -- order.toSet
    if (unknown.nonEmpty) fail(s"$fn: unknown named argument(s) ${unknown.mkString(", ")}")
    // every non-optional name must be present (OFFSET is the only
    // optional one) — else e.g. TUMBLE(DATA=>, TIMECOL=>, OFFSET=>)
    // would silently compact the OFFSET into the SIZE slot
    val required = order.filterNot(_ == "OFFSET")
    val missing = required.filterNot(m.contains)
    if (missing.nonEmpty)
      fail(s"$fn: missing required argument(s) ${missing.mkString(", ")}")
    order.flatMap(m.get)
  }

  private val tableRe = raw"(?is)^TABLE\s+([A-Za-z_][\w.]*)$$".r
  private val tablePartRe =
    raw"(?is)^TABLE\s+([A-Za-z_][\w.]*)\s+PARTITION\s+BY\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)$$".r
  private val descRe = raw"(?is)^DESCRIPTOR\s*\(\s*([A-Za-z_]\w*)\s*\)$$".r

  /** [start, end] bounds of the first `TABLE(WTF(...))` span. */
  private[plans] def firstSpan(sqlText: String): (Int, Int) = {
    val mm = head.findFirstMatchIn(sqlText).getOrElse(fail("no window-TVF span"))
    val innerClose = matchParen(sqlText, mm.end - 1)
    val afterInner = sqlText.indexWhere(!_.isWhitespace, innerClose + 1)
    if (afterInner < 0 || sqlText.charAt(afterInner) != ')')
      fail("expected `TABLE( <fn>(...) )`")
    (mm.start, afterInner)
  }

  /** Rewrite ALL window-TVF spans in `sqlText` to plain-Spark subqueries. */
  def rewrite(sqlText: String): String = {
    var text = sqlText
    var m = head.findFirstMatchIn(text)
    var guard = 0
    while (m.isDefined && guard < 16) {
      val mm = m.get
      // span of the INNER argument list (balanced from the fn's open paren)
      val innerOpen = mm.end - 1
      val innerClose = matchParen(text, innerOpen)
      // the OUTER `TABLE(` paren closes right after, possibly with spaces
      val afterInner = text.indexWhere(!_.isWhitespace, innerClose + 1)
      if (afterInner < 0 || text.charAt(afterInner) != ')')
        fail("expected `TABLE( <fn>(...) )`")
      val fn = mm.group(1).toUpperCase
      val args = normalizeArgs(fn, splitArgs(text.substring(innerOpen + 1, innerClose)))
      val sub = buildSubquery(fn, args)
      text = text.substring(0, mm.start) + sub + text.substring(afterInner + 1)
      m = head.findFirstMatchIn(text)
      guard += 1
    }
    text
  }

  /** Index of the `)` closing the `(` at `open`; parens inside
    * single-quoted literals don't count ('' is an escaped quote).
    */
  private[plans] def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') {
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i }
        i += 1
      }
    }
    fail("unbalanced parentheses")
  }

  private def buildSubquery(fn: String, args: Seq[String]): String = {
    val ts = args.lift(1).collect { case descRe(c) => c }
      .getOrElse(fail(s"second arg of $fn must be DESCRIPTOR(<col>)"))
    val es = s"unix_seconds(CAST($ts AS TIMESTAMP))"
    if (fn == "SESSION") {
      // SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts), gap) — 1.19's
      // session TVF. Merged-session assignment is not row-local, but it
      // IS window-function-expressible (gaps-and-islands): a new session
      // starts only when the gap to the previous row in the partition is
      // STRICTLY greater than gap. Flink's TimeWindow.intersects treats
      // abutting [ts,ts+gap)/[ts+gap,ts+2gap) windows as intersecting,
      // so events exactly `gap` apart merge into ONE session — and
      // Spark's native session_window agrees (both pinned in
      // WindowTvfSpec); window_end = last rowtime + gap.
      // PARTITION BY may list several keys or be absent (global session):
      // the key list lands verbatim in the window specs; `1` (a literal
      // in window PARTITION BY) makes the partition-less case one group
      val (table, key) = args.headOption.collect {
        case tablePartRe(t, k) => (t, k)
        case tableRe(t) => (t, "1")
      }.getOrElse(fail("SESSION takes (TABLE t [PARTITION BY k1, ...], DESCRIPTOR(ts), gap)"))
      if (args.size != 3) fail("SESSION takes (TABLE t PARTITION BY key, DESCRIPTOR(ts), gap)")
      // micros, not seconds: session boundaries depend on exact rowtime
      // deltas (unlike the div-bucketed TVFs, whose edges are whole-second
      // aligned), so truncating would merge/split sub-second gaps
      val gapUs = seconds(args(2)) * 1000000L
      val us = s"unix_micros(CAST($ts AS TIMESTAMP))"
      return s"""(SELECT * EXCEPT(__sid),
        |  timestamp_micros(min($us) OVER (PARTITION BY $key, __sid)) AS window_start,
        |  timestamp_micros(max($us) OVER (PARTITION BY $key, __sid) + ${gapUs}L) AS window_end,
        |  timestamp_micros(max($us) OVER (PARTITION BY $key, __sid) + ${gapUs}L - 1000L) AS window_time
        | FROM (SELECT * EXCEPT(__new),
        |   sum(__new) OVER (PARTITION BY $key ORDER BY $ts
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __sid
        |  FROM (SELECT *,
        |    CASE WHEN $us - lag($us) OVER (PARTITION BY $key ORDER BY $ts) > ${gapUs}L
        |         THEN 1 ELSE 0 END AS __new
        |   FROM $table)))""".stripMargin
    }
    val table = args.headOption.collect { case tableRe(t) => t }
      .getOrElse(fail(s"first arg of $fn must be TABLE <name>"))
    // Floor division, not Spark's truncate-toward-zero `div`: for
    // pre-epoch rowtimes (negative seconds) truncation would shift
    // window starts up one bucket and drop the earliest covering HOP
    // windows, diverging from native window(). floordiv stays in BIGINT
    // arithmetic (no double round-trip) so large epochs stay exact.
    def floordiv(num: String, den: Long): String =
      s"(($num) div $den + (CASE WHEN ($num) % $den < 0 THEN -1 ELSE 0 END))"
    fn match {
      case "TUMBLE" =>
        // optional trailing arg: Flink's window offset (alignment shift)
        if (args.size < 3 || args.size > 4)
          fail("TUMBLE takes (TABLE t, DESCRIPTOR(ts), size [, offset])")
        val sz = seconds(args(2))
        val off = if (args.size > 3) seconds(args(3)) else 0L
        val k = floordiv(s"$es - $off", sz)
        s"""(SELECT *,
           |  timestamp_seconds($k * $sz + $off) AS window_start,
           |  timestamp_seconds($k * $sz + $off + $sz) AS window_end,
           |  timestamp_seconds($k * $sz + $off + $sz) - INTERVAL '1' MILLISECOND AS window_time
           | FROM $table)""".stripMargin
      case "HOP" =>
        if (args.size < 4 || args.size > 5)
          fail("HOP takes (TABLE t, DESCRIPTOR(ts), slide, size [, offset])")
        val sl = seconds(args(2))
        val sz = seconds(args(3))
        val off = if (args.size > 4) seconds(args(4)) else 0L
        if (sz % sl != 0) fail("HOP size must be a multiple of slide")
        val lo = floordiv(s"$es - $off - $sz", sl)
        val hi = floordiv(s"$es - $off", sl)
        s"""(SELECT * EXCEPT(__k),
           |  timestamp_seconds(__k * $sl + $off) AS window_start,
           |  timestamp_seconds(__k * $sl + $off + $sz) AS window_end,
           |  timestamp_seconds(__k * $sl + $off + $sz) - INTERVAL '1' MILLISECOND AS window_time
           | FROM (SELECT *,
           |   explode(sequence($lo + 1, $hi)) AS __k
           |  FROM $table))""".stripMargin
      case "CUMULATE" =>
        if (args.size < 4 || args.size > 5)
          fail("CUMULATE takes (TABLE t, DESCRIPTOR(ts), step, size [, offset])")
        val st = seconds(args(2))
        val sz = seconds(args(3))
        val off = if (args.size > 4) seconds(args(4)) else 0L
        if (sz % st != 0) fail("CUMULATE size must be a multiple of step")
        val k = floordiv(s"$es - $off", sz)
        s"""(SELECT * EXCEPT(__k),
           |  timestamp_seconds($k * $sz + $off) AS window_start,
           |  timestamp_seconds($k * $sz + $off + __k * $st) AS window_end,
           |  timestamp_seconds($k * $sz + $off + __k * $st) - INTERVAL '1' MILLISECOND AS window_time
           | FROM (SELECT *,
           |   explode(sequence(($es - $off - $k * $sz) div $st + 1, ${sz / st})) AS __k
           |  FROM $table))""".stripMargin
    }
  }

  /** STREAMING rewrite: one TUMBLE/HOP span rewritten onto Spark's native
    * `window()` so Structured Streaming can watermark-track the grouping
    * (the batch [[rewrite]]'s derived `window_start` column cannot be —
    * grouping state would never evict). Shape:
    *
    *  - the `TABLE(WTF(...))` span becomes a subquery projecting the
    *    native window struct as `__gw` plus `window_start` / `window_end`
    *    / `window_time` scalar aliases (so the user's SELECT text resolves
    *    unchanged, and sink column names stay Flink's);
    *  - `__gw` is prepended to the first GROUP BY after the span — the
    *    struct carries the event-time watermark tag, which is what the
    *    streaming aggregation checker requires; the extra key does not
    *    change the groups (start/end are functions of the struct).
    *
    * SESSION rewrites differently: `session_window()` must sit DIRECTLY
    * in the grouping, so the GROUP BY's window_start/window_end keys
    * become the session expression and remaining window_* references
    * become field accesses on the struct (output names become the field
    * names — the streaming INSERT's positional sink mapping restores
    * Flink's).
    *
    * Subset (clear error outside it): single span (streaming window JOINS
    * deploy via `streaming/WindowJoin`); CUMULATE streams via
    * `streaming/CumulateOps` (per-step emission).
    */
  def rewriteStreaming(sqlText: String): String = {
    val ms = head.findAllMatchIn(sqlText).toSeq
    if (ms.isEmpty) return sqlText
    if (ms.size > 1)
      fail("streaming supports ONE window-TVF span per statement " +
        "(streaming window joins deploy via graft.streaming.WindowJoin)")
    val mm = ms.head
    val innerOpen = mm.end - 1
    val innerClose = matchParen(sqlText, innerOpen)
    val afterInner = sqlText.indexWhere(!_.isWhitespace, innerClose + 1)
    if (afterInner < 0 || sqlText.charAt(afterInner) != ')')
      fail("expected `TABLE( <fn>(...) )`")
    val fn = mm.group(1).toUpperCase
    val args = normalizeArgs(fn, splitArgs(sqlText.substring(innerOpen + 1, innerClose)))
    val ts = args.lift(1).collect { case descRe(c) => c }
      .getOrElse(fail(s"second arg of $fn must be DESCRIPTOR(<col>)"))
    val table = args.headOption.collect {
      case tablePartRe(t, _) => t
      case tableRe(t) => t
    }.getOrElse(fail(s"streaming $fn takes TABLE <name> first"))
    val wexpr = fn match {
      case "TUMBLE" =>
        if (args.size < 3 || args.size > 4)
          fail("TUMBLE takes (TABLE t, DESCRIPTOR(ts), size [, offset])")
        val sz = seconds(args(2))
        val off = if (args.size > 3) seconds(args(3)) else 0L
        s"window($ts, '$sz seconds', '$sz seconds', '$off seconds')"
      case "HOP" =>
        if (args.size < 4 || args.size > 5)
          fail("HOP takes (TABLE t, DESCRIPTOR(ts), slide, size [, offset])")
        val sl = seconds(args(2))
        val sz = seconds(args(3))
        val off = if (args.size > 4) seconds(args(4)) else 0L
        if (sz % sl != 0) fail("HOP size must be a multiple of slide")
        s"window($ts, '$sz seconds', '$sl seconds', '$off seconds')"
      case "SESSION" =>
        // session_window() must sit DIRECTLY in the streaming grouping
        // (Spark's SessionWindowing rule resolves it only there), so
        // SESSION takes a different shape: the span becomes the bare
        // table, the GROUP BY's window_start/window_end keys become the
        // session_window expression, and remaining window_start/_end/
        // _time references become field accesses on the struct. Output
        // column NAMES become the field names (`start`/`end`) — the
        // streaming INSERT path renames positionally onto the sink's
        // declared columns, so sinks still see Flink's names.
        val t = args.headOption.collect {
          case tablePartRe(tn, _) => tn
          case tableRe(tn) => tn
        }.getOrElse(fail("SESSION takes (TABLE t [PARTITION BY k], DESCRIPTOR(ts), gap)"))
        if (args.size != 3) fail("SESSION takes (TABLE t [PARTITION BY k], DESCRIPTOR(ts), gap)")
        val gap = seconds(args(2))
        val sw = s"session_window($ts, '$gap seconds')"
        var text = sqlText.substring(0, mm.start) + t + sqlText.substring(afterInner + 1)
        val gbm = raw"(?is)\bGROUP\s+BY\b".r.findAllMatchIn(text)
          .find(_.start >= mm.start)
          .getOrElse(fail("streaming SESSION needs a GROUP BY window_start, window_end aggregate"))
        val tailStart = raw"(?is)\b(HAVING|ORDER\s+BY|LIMIT)\b".r
          .findFirstMatchIn(text.substring(gbm.end)).map(gbm.end + _.start)
          .getOrElse(text.length)
        val items = splitArgs(text.substring(gbm.end, tailStart))
        val isWin = (s: String) =>
          s.equalsIgnoreCase("window_start") || s.equalsIgnoreCase("window_end")
        if (!items.exists(isWin))
          fail("streaming SESSION needs window_start/window_end among the GROUP BY keys")
        val kept = items.filterNot(isWin)
        text = text.substring(0, gbm.end) + " " + (sw +: kept).mkString(", ") +
          text.substring(tailStart)
        return replaceIdent(replaceIdent(replaceIdent(text,
          "window_time", s"session_window.end - INTERVAL '1' MILLISECOND"),
          "window_start", "session_window.start"),
          "window_end", "session_window.end")
      case "CUMULATE" =>
        fail("streaming CUMULATE deploys via the streaming-INSERT routing " +
          "(FlinkDdl.startCumulate: native step slices + per-step re-aggregation); " +
          "it has no single native-window equivalent")
    }
    val sub =
      s"""(SELECT *, __gw.start AS window_start, __gw.end AS window_end,
         |  __gw.end - INTERVAL '1' MILLISECOND AS window_time
         | FROM (SELECT *, $wexpr AS __gw FROM $table))""".stripMargin
    val replaced = sqlText.substring(0, mm.start) + sub + sqlText.substring(afterInner + 1)
    // prepend the struct to the first GROUP BY after the span so the
    // watermark-tagged column is among the grouping keys
    val gb = raw"(?is)\bGROUP\s+BY\b".r.findAllMatchIn(replaced)
      .find(_.start > mm.start)
    gb match {
      case Some(g) =>
        replaced.substring(0, g.end) + " __gw," + replaced.substring(g.end)
      case None => replaced // pure projection: stateless streaming map
    }
  }

  /** Replace whole-word occurrences of `ident` outside single-quoted
    * literals. */
  private def replaceIdent(sqlText: String, ident: String, to: String): String = {
    val re = raw"(?i)\b${java.util.regex.Pattern.quote(ident)}\b".r
    val sb = new StringBuilder
    var i = 0
    while (i < sqlText.length) {
      val c = sqlText.charAt(i)
      if (c == '\'') {
        val close = matchQuote(sqlText, i)
        sb.append(sqlText.substring(i, close + 1)); i = close + 1
      } else {
        val next = sqlText.indexOf('\'', i)
        val seg = if (next < 0) sqlText.substring(i) else sqlText.substring(i, next)
        sb.append(re.replaceAllIn(seg, java.util.regex.Matcher.quoteReplacement(to)))
        i = if (next < 0) sqlText.length else next
      }
    }
    sb.result()
  }

  /** Index of the `'` closing the literal opened at `open` ('' escapes). */
  private def matchQuote(s: String, open: Int): Int = {
    var i = open + 1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
        else return i
      } else i += 1
    }
    s.length - 1
  }
}
