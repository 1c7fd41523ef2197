package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming row-time OVER deployment ([U] flink-table-runtime
  * `operators/over/` RowTimeRangeBoundedPrecedingFunction /
  * RowTimeRowsBoundedPrecedingFunction / RowTimeRowsUnboundedPreceding-
  * Function): a streaming INSERT whose SELECT is an OVER aggregate
  * ordered by the source's declared watermark rowtime lowers onto the
  * keyed `streaming/OverOps` processes — Spark has no stateful
  * window-function operator (a window function over a stream is an
  * AnalysisException), so the shape is detected in the statement text
  * and re-planned onto `transformWithState`, the same way CUMULATE and
  * windowed Top-N ride their deployment shapes.
  *
  * Declared subset (anything else fails typed with porting guidance,
  * like the other deployment shapes):
  *  - ONE window spec — inline `OVER (...)` (all occurrences identical)
  *    or one `WINDOW w AS (...)` clause;
  *  - `PARTITION BY <col> [, <col> ...] ORDER BY <the watermark
  *    rowtime>` — any number of partition columns of integral, string,
  *    boolean, or date type (the tuple travels through the kernel as a
  *    JSON-encoded opaque key and is restored loss-free on the way
  *    out; fractional keys are rejected — their text round-trip is not
  *    exact);
  *  - frame `RANGE BETWEEN INTERVAL 'n' unit PRECEDING AND CURRENT ROW`,
  *    `ROWS BETWEEN n PRECEDING AND CURRENT ROW`,
  *    `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW` (per-row
  *    frames), or `RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`
  *    (equal-rowtime peers share one group-inclusive frame — the SQL
  *    RANGE tie semantics, running-accumulator state either way);
  *  - aggregates SUM / AVG / MIN / MAX / FIRST_VALUE / LAST_VALUE over
  *    any mix of NUMERIC value columns (each aggregate names its own
  *    column — the distinct columns ride the kernel as one DOUBLE
  *    vector, one `element_at` slot per column, and results come back
  *    DOUBLE; MIN / MAX / FIRST_VALUE / LAST_VALUE / LAG additionally
  *    accept STRING columns — the reference's String{Min,Max}Agg
  *    surface — riding a separate native-null string vector with
  *    UTF-8-binary ordering (Spark's string collation) and coming
  *    back STRING, and TIMESTAMP columns, riding the double vector as
  *    exact unix millis and cast back at the splice (micros truncate —
  *    the same documented ms coarsening as rowtimes; SUM/AVG/variance
  *    over a timestamp fail typed, as in SQL); other non-numeric value
  *    columns fail typed), COUNT(*) and
  *    null-skipping COUNT(col) — STRING columns included (the slot
  *    carries only the null mask; arithmetic aggregates over strings
  *    fail typed), COUNT(DISTINCT string_col) via exact seen-string
  *    sets on the string slot vector (unbounded frames keep per-key
  *    seen-string state under its own state name; bounded frames fold
  *    over the retained rows' svalues) —
  *    ROW_NUMBER() on the unbounded ROWS
  *    frame, LAG(col [, n])
  *    on EVERY frame (row-based even under RANGE peers, NULL before
  *    the nth predecessor — a trailing snapshot rides each kernel's
  *    state; LEAD fails typed — a rowtime frame ending at CURRENT ROW
  *    sees no future rows, and the reference's streaming runtime has
  *    no rowtime LEAD either), the STDDEV/VARIANCE family
  *    (STDDEV_POP/STDDEV_SAMP/STDDEV/VAR_POP/VAR_SAMP/VARIANCE — a
  *    sum-of-squares slot every kernel carries; VAR_SAMP of a 1-row
  *    frame is NULL), plus
  *    SUM/COUNT/AVG(DISTINCT col) AND the STDDEV/VARIANCE family with
  *    DISTINCT on EVERY frame (unbounded frames keep per-key
  *    distinct-value state — the reference's MapView cardinality —
  *    from which the distinct sum-of-squares also derives; bounded
  *    frames fold DISTINCT over the retained frame rows at emission,
  *    which ARE the bounded kernels' state shape already, so no
  *    per-value refcounts are needed — an evicted-then-repeated value
  *    re-counts exactly because the fold sees the live frame;
  *    MIN/MAX(DISTINCT) strip to the identical plain forms);
  *  - the remaining select items must include the row's unique integral
  *    id column as a PLAIN item (the deterministic-order tiebreak the
  *    reference takes from the input's order) — other plain items may
  *    only be partition columns and the rowtime;
  *  - after the top-level FROM: exactly `<source> [alias]` (plus the
  *    stripped WINDOW clause). A WHERE / GROUP BY / join there is
  *    REJECTED typed rather than silently mis-ordered: the outer
  *    projection re-applies after the kernel, so a predicate would
  *    filter AFTER the window while Flink filters BEFORE it — filter
  *    in a view feeding the source instead.
  *
  * NULL semantics are exact SQL (round 13 — a null value column
  * previously killed the query on the kernel encoder's not-null
  * assert): nulls ride a parallel per-slot mask next to the primitive
  * value vector; SUM/AVG/MIN/MAX/COUNT(col)/the variance family skip
  * them per slot (NULL over an all-null frame — per-slot non-null
  * counts ride the kernel output), DISTINCT sets never admit them, and
  * FIRST_VALUE/LAST_VALUE/LAG are RESPECT NULLS (the SQL default) via
  * first/last/lag null masks. Stream ≡ batch with null rows is
  * spec-locked on unbounded and bounded frames.
  *
  * Documented delta: rowtimes are handled at millisecond precision (the
  * kernel's frontier unit), and late rows behind the emitted frontier
  * drop — Flink's lastTriggeringTs rule.
  *
  * PROC-TIME OVER ([U] flink-table-runtime `operators/over/`
  * ProcTime{Range,Rows}BoundedPrecedingFunction /
  * ProcTimeRowsUnboundedPrecedingFunction): an ORDER BY on a computed
  * `PROCTIME()` column deploys onto the SAME kernels (the deployment
  * layer attaches a 0-delay watermark to that column). Documented
  * coarsening, consistent with PROCTIME()'s batch behavior
  * (`FlinkFunctions`): processing time is the MICRO-BATCH timestamp,
  * so all rows of one batch are time peers — they order by the id
  * tiebreak where Flink uses per-row arrival order, a RANGE frame
  * groups whole batches, and a batch's rows emit once a later batch
  * advances the frontier (Flink's proc-time emission is also
  * timer-deferred, by exactly one timer unit).
  */
object RowtimeOver {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"streaming OVER: $msg")

  /** Cheap routing probe — an OVER window-function shape in the text. */
  def containsClause(sqlText: String): Boolean =
    raw"(?is)\bOVER\s*\(".r.findFirstIn(sqlText).isDefined ||
      raw"(?is)\bWINDOW\s+\w+\s+AS\s*\(".r.findFirstIn(sqlText).isDefined

  sealed trait Frame
  final case class RangeMs(ms: Long) extends Frame
  final case class RowsN(n: Int) extends Frame
  case object UnboundedRows extends Frame
  case object UnboundedRange extends Frame

  final case class Spec(partCols: Seq[String], orderCol: String, frame: Frame,
      valueCols: Seq[String], idCol: String, rewritten: String, usesRn: Boolean,
      maxLag: Int, distinctSlots: Seq[Int], fromTable: String, fromSpan: (Int, Int),
      stringCols: Seq[String], tsCols: Seq[String],
      distinctStrSlots: Seq[Int] = Seq.empty,
      fromAlias: Option[String] = None)

  private def unitMs(u: String): Long = u.toUpperCase match {
    case "SECOND" => 1000L
    case "MINUTE" => 60000L
    case "HOUR" => 3600000L
    case "DAY" => 86400000L
    case other => fail(s"unsupported RANGE interval unit '$other'")
  }

  private def bare(ident: String): String =
    ident.split('.').last.replace("`", "")

  /** SQL identifier word character: `_` counts, so `valid_from`,
    * `from_city`, and the DATE splice's `date_from_unix_date` never match
    * a bare FROM token. */
  private def isWordChar(ch: Char): Boolean =
    Character.isLetterOrDigit(ch) || ch == '_'

  /** Parse the declared OVER subset out of `select`, producing the spec
    * and the rewritten outer text (agg spans replaced with `__over_*`
    * references, WINDOW clause stripped, source-table span tracked for
    * the exact splice in [[lower]]). `isStringCol` (schema-aware,
    * supplied by [[lower]]) routes a positional/offset function's
    * column onto the STRING slot vector; the default (all-numeric)
    * serves the schema-free callers — the routing probe and the
    * parse-totality fuzz.
    */
  def parse(select: String,
      isStringCol: String => Boolean = _ => false,
      isTimestampCol: String => Boolean = _ => false,
      isDateCol: String => Boolean = _ => false): Spec = {
    // ---- locate the window spec (named WINDOW clause or inline) ----
    val winRe = raw"(?is)\bWINDOW\s+(\w+)\s+AS\s*\(".r
    val named = winRe.findAllMatchIn(select).toList
    if (named.size > 1) fail("exactly one WINDOW clause is supported")
    val (specText, windowName, stripSpan) = named.headOption match {
      case Some(m) =>
        val close = WindowTvf.matchParen(select, m.end - 1)
        (select.substring(m.end, close), Some(m.group(1)), Some((m.start, close + 1)))
      case None =>
        val inline = raw"(?is)\bOVER\s*\(".r.findAllMatchIn(select).toList
        if (inline.isEmpty) fail("no OVER window spec found")
        val specs = inline.map { m =>
          val close = WindowTvf.matchParen(select, m.end - 1)
          select.substring(m.end, close)
        }
        val norm = specs.map(_.replaceAll("\\s+", " ").trim.toUpperCase)
        if (norm.distinct.size > 1)
          fail("every inline OVER must use the identical window spec " +
            "(or name one WINDOW clause)")
        (specs.head, None, None)
    }

    // ---- parse the spec ----
    val partM = raw"(?is)\bPARTITION\s+BY\s+((?:[`\w.]+\s*,\s*)*[`\w.]+)".r
      .findFirstMatchIn(specText)
      .getOrElse(fail("the spec must PARTITION BY at least one column"))
    val partCols = partM.group(1).split(",").map(s => bare(s.trim)).toSeq
    val orderM = raw"(?is)\bORDER\s+BY\s+([`\w.]+)(\s+(?:ASC|DESC))?\s*(,?)".r
      .findFirstMatchIn(specText)
      .getOrElse(fail("the spec must ORDER BY the watermark rowtime"))
    if (orderM.group(3) == ",") fail("a single ORDER BY column is supported")
    if (Option(orderM.group(2)).exists(_.trim.equalsIgnoreCase("DESC")))
      fail("ORDER BY ... DESC has no streaming frontier; order ascending by the rowtime")
    val orderCol = bare(orderM.group(1))
    val frame =
      raw"(?is)\bRANGE\s+BETWEEN\s+INTERVAL\s*'(\d+)'\s+(\w+?)S?\s+PRECEDING\s+AND\s+CURRENT\s+ROW".r
        .findFirstMatchIn(specText)
        .map(m => RangeMs(m.group(1).toLong * unitMs(m.group(2))): Frame)
      .orElse(raw"(?is)\bROWS\s+BETWEEN\s+(\d+)\s+PRECEDING\s+AND\s+CURRENT\s+ROW".r
        .findFirstMatchIn(specText)
        .map(m => RowsN(m.group(1).toInt + 1)))
      .orElse(raw"(?is)\bROWS\s+BETWEEN\s+UNBOUNDED\s+PRECEDING\s+AND\s+CURRENT\s+ROW".r
        .findFirstMatchIn(specText).map(_ => UnboundedRows))
      .orElse(raw"(?is)\bRANGE\s+BETWEEN\s+UNBOUNDED\s+PRECEDING\s+AND\s+CURRENT\s+ROW".r
        .findFirstMatchIn(specText).map(_ => UnboundedRange))
      .getOrElse(
        fail("declare an explicit frame: RANGE BETWEEN INTERVAL 'n' unit " +
          "PRECEDING AND CURRENT ROW, ROWS BETWEEN n PRECEDING AND CURRENT " +
          "ROW, or ROWS/RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW " +
          "(RANGE groups equal-rowtime peers into one shared frame; ROWS " +
          "gives every row its own)"))

    // ---- locate and replace every aggregate-OVER span ----
    val aggRe =
      raw"(?is)\b(SUM|COUNT|AVG|MIN|MAX|FIRST_VALUE|LAST_VALUE|ROW_NUMBER|LAG|LEAD|STDDEV_POP|STDDEV_SAMP|STDDEV|VAR_POP|VAR_SAMP|VARIANCE)\s*\(([^()]*)\)\s+OVER\b".r
    var usesRn = false
    var maxLag = 0
    // 1-based slots whose DISTINCT running sum/count the kernel tracks
    val distinctSlots = scala.collection.mutable.SortedSet.empty[Int]
    val distinctStrSlots = scala.collection.mutable.SortedSet.empty[Int]
    // per-aggregate value columns: each distinct column gets a slot in
    // the kernel's values vector; the splice reads its slot back with
    // element_at (1-based)
    val valueCols = scala.collection.mutable.ArrayBuffer.empty[String]
    def slot(c: String): Int = {
      val b = bare(c.trim)
      val at = valueCols.indexWhere(_.equalsIgnoreCase(b))
      if (at >= 0) at + 1 else { valueCols += b; valueCols.length }
    }
    // the kernels emit EMPTY null metadata on the no-nulls fast path
    // (output-encoder cost — see OverNulls.maskOrEmpty), so a missing
    // per-slot non-null count defaults to the frame row count
    def nnOf(n: Int): String =
      s"coalesce(try_element_at(__over_nn, $n), __over_cnt)"
    // STRING slots (FIRST/LAST_VALUE and LAG over string columns) ride
    // a separate vector — strings hold SQL NULL natively there
    val stringCols = scala.collection.mutable.ArrayBuffer.empty[String]
    def sslot(c: String): Int = {
      val b = bare(c.trim)
      val at = stringCols.indexWhere(_.equalsIgnoreCase(b))
      if (at >= 0) at + 1 else { stringCols += b; stringCols.length }
    }
    // TIMESTAMP columns for MIN/MAX/FIRST/LAST/LAG ride the DOUBLE
    // vector as exact unix millis (the kernel's time unit — micros
    // truncate, the same documented ms coarsening as rowtimes) and
    // cast back at the splice; arithmetic aggregates over timestamps
    // fail typed (SQL has no SUM(timestamp) either)
    val tsCols = scala.collection.mutable.LinkedHashSet.empty[String]
    def tsWrap(c: String, inner: String): String =
      if (isTimestampCol(bare(c))) {
        tsCols += bare(c)
        s"CAST(timestamp_millis(CAST($inner AS BIGINT)) AS TIMESTAMP)"
      } else if (isDateCol(bare(c))) {
        // DATE rides as exact epoch days on the same double vector
        tsCols += bare(c)
        s"date_from_unix_date(CAST($inner AS INT))"
      } else inner
    def failTsArith(fn: String, c: String): Unit = {
      if (isTimestampCol(bare(c)) || isDateCol(bare(c)))
        fail(s"$fn over TIMESTAMP/DATE column '${bare(c)}' is not SQL arithmetic — " +
          "MIN/MAX/FIRST_VALUE/LAST_VALUE/LAG accept time types; for " +
          "durations aggregate unix_millis/unix_date differences instead")
      if (isStringCol(bare(c)))
        fail(s"$fn over STRING column '${bare(c)}' is not SQL arithmetic — " +
          "COUNT/MIN/MAX/FIRST_VALUE/LAST_VALUE/LAG accept string columns")
    }
    val repl = aggRe.findAllMatchIn(select).toList.map { m =>
      // span end: OVER <name> or OVER (...)
      var i = m.end
      while (i < select.length && select.charAt(i).isWhitespace) i += 1
      val end =
        if (i < select.length && select.charAt(i) == '(') WindowTvf.matchParen(select, i) + 1
        else {
          val nm = raw"^\w+".r.findFirstIn(select.substring(i))
            .getOrElse(fail("OVER must name a WINDOW clause or inline a spec"))
          if (!windowName.exists(_.equalsIgnoreCase(nm)))
            fail(s"OVER $nm does not match the declared WINDOW clause")
          i + nm.length
        }
      val rawArg = m.group(2).trim
      // DISTINCT aggregates ([U] flink-table-runtime distinct MapView
      // state): running distinct sum/count ride the unbounded frames
      val isDistinct =
        raw"(?is)^DISTINCT\s".r.findFirstIn(rawArg).isDefined
      val arg = if (isDistinct) rawArg.replaceFirst("(?is)^DISTINCT\\s+", "").trim
        else rawArg
      def distinctSlot(c: String): Int = {
        val n = slot(c)
        distinctSlots += n
        n
      }
      val out = m.group(1).toUpperCase match {
        // SQL null semantics throughout: the kernels skip masked (NULL)
        // entries per slot and report per-slot non-null counts
        // (__over_nn); an aggregate whose frame holds no non-null value
        // is NULL, exactly like batch SQL
        case "SUM" =>
          failTsArith("SUM", arg)
          if (isDistinct) {
            val n = distinctSlot(arg)
            s"(CASE WHEN element_at(__over_dcnt, $n) > 0 THEN " +
              s"element_at(__over_dsum, $n) END)"
          } else {
            val n = slot(arg)
            s"(CASE WHEN ${nnOf(n)} > 0 THEN element_at(__over_sum, $n) END)"
          }
        case "AVG" =>
          failTsArith("AVG", arg)
          if (isDistinct) {
            val n = distinctSlot(arg)
            s"(element_at(__over_dsum, $n) / nullif(element_at(__over_dcnt, $n), 0))"
          } else {
            val n = slot(arg)
            s"(element_at(__over_sum, $n) / nullif(${nnOf(n)}, 0))"
          }
        // MIN/MAX are duplicate-insensitive: DISTINCT strips to the plain
        // form; string columns ride the string slot vector (the
        // reference's String{Min,Max}AggFunction surface), where SQL
        // NULL is native — an all-null frame's slot already holds NULL
        case "MIN" =>
          if (isStringCol(bare(arg))) s"element_at(__over_min_s, ${sslot(arg)})"
          else {
            val n = slot(arg)
            tsWrap(arg, s"(CASE WHEN ${nnOf(n)} > 0 THEN element_at(__over_min, $n) END)")
          }
        case "MAX" =>
          if (isStringCol(bare(arg))) s"element_at(__over_max_s, ${sslot(arg)})"
          else {
            val n = slot(arg)
            tsWrap(arg, s"(CASE WHEN ${nnOf(n)} > 0 THEN element_at(__over_max, $n) END)")
          }
        // variance family from the kernels' sum-of-squares slot
        // (Flink aliases: STDDEV = STDDEV_SAMP, VARIANCE = VAR_SAMP);
        // greatest(0) clamps the fp-cancellation epsilon before sqrt.
        // DISTINCT variants read the distinct sum/count/sum-of-squares
        // slots instead (the kernels derive distinct sumsq from the
        // same seen-value state / retained frame the plain DISTINCT
        // aggregates already carry — no new state shape)
        case v @ ("STDDEV_POP" | "STDDEV_SAMP" | "STDDEV" |
                  "VAR_POP" | "VAR_SAMP" | "VARIANCE") =>
          failTsArith(v, arg)
          val (s, q, c) =
            if (isDistinct) {
              val n = distinctSlot(arg)
              (s"element_at(__over_dsum, $n)", s"element_at(__over_dsumsq, $n)",
                s"element_at(__over_dcnt, $n)")
            } else {
              val n = slot(arg)
              (s"element_at(__over_sum, $n)", s"element_at(__over_sumsq, $n)",
                nnOf(n))
            }
          // empty (all-null) frames must be NULL, not clamped:
          // greatest() SKIPS nulls, so both divisions are guarded
          val varPop = s"(CASE WHEN $c > 0 THEN " +
            s"greatest(0.0d, $q / $c - pow($s / $c, 2)) END)"
          val varSamp = s"(CASE WHEN $c > 1 THEN " +
            s"greatest(0.0d, ($q - pow($s, 2) / $c) / ($c - 1)) END)"
          v match {
            case "VAR_POP" => s"($varPop)"
            case "VAR_SAMP" | "VARIANCE" => s"($varSamp)"
            case "STDDEV_POP" => s"sqrt($varPop)"
            case _ => s"sqrt($varSamp)"
          }
        case "FIRST_VALUE" | "LAST_VALUE" if isDistinct =>
          fail(s"${m.group(1).toUpperCase}(DISTINCT ...) is not SQL")
        // positional functions are RESPECT NULLS (the SQL default): a
        // frame whose first/last row holds NULL in the slot reports NULL
        case "FIRST_VALUE" =>
          if (isStringCol(bare(arg))) s"element_at(__over_first_s, ${sslot(arg)})"
          else {
            val n = slot(arg)
            tsWrap(arg,
              s"(CASE WHEN coalesce(try_element_at(__over_first_null, $n), false) " +
                s"THEN CAST(NULL AS DOUBLE) ELSE element_at(__over_first, $n) END)")
          }
        case "LAST_VALUE" =>
          if (isStringCol(bare(arg))) s"element_at(__over_last_s, ${sslot(arg)})"
          else {
            val n = slot(arg)
            tsWrap(arg,
              s"(CASE WHEN coalesce(try_element_at(__over_last_null, $n), false) " +
                s"THEN CAST(NULL AS DOUBLE) ELSE element_at(__over_last, $n) END)")
          }
        case "COUNT" =>
          if (isDistinct) {
            // a string column's distinct set rides the string slot
            // vector (exact seen-string state — never a hashed double)
            if (isStringCol(bare(arg))) {
              val n = sslot(arg)
              distinctStrSlots += n
              s"element_at(__over_dcnt_s, $n)"
            } else s"element_at(__over_dcnt, ${distinctSlot(arg)})"
          }
          else if (arg == "*" || arg == "1") "__over_cnt"
          // null-skipping COUNT(col): the per-slot non-null count (a
          // STRING column rides the numeric slot's NULL MASK with value
          // 0.0 — COUNT never decodes the value)
          else nnOf(slot(arg))
        case "ROW_NUMBER" =>
          if (arg.nonEmpty) fail("ROW_NUMBER takes no arguments")
          if (frame != UnboundedRows)
            fail("ROW_NUMBER rides the unbounded ROWS running frame only")
          usesRn = true; "__over_rn"
        case "LAG" =>
          // LAG(col [, offset]) — offset functions ignore the frame in
          // SQL; every kernel carries a trailing value-vector snapshot
          // of the last maxLag emitted rows in (ts, id) order
          if (isDistinct) fail("LAG(DISTINCT ...) is not SQL")
          val parts = arg.split(",").map(_.trim)
          if (parts.isEmpty || parts.length > 2 || parts(0).isEmpty)
            fail("LAG takes (column [, offset]) — a default value argument " +
              "is not in the subset (COALESCE the result instead)")
          val off =
            if (parts.length == 1) 1
            else parts(1).toIntOption.filter(_ >= 1).getOrElse(
              fail(s"LAG offset must be a positive integer literal, saw '${parts(1)}'"))
          maxLag = math.max(maxLag, off)
          // missing predecessors → NULL (try_element_at, not element_at:
          // the deploy runs under ANSI); a predecessor whose slot was
          // NULL reports NULL too (the parallel lag null-mask; string
          // slots hold NULL natively)
          if (isStringCol(bare(parts(0))))
            s"try_element_at(try_element_at(__over_lags_s, $off), ${sslot(parts(0))})"
          else {
            val n = slot(parts(0))
            tsWrap(parts(0),
              s"(CASE WHEN coalesce(try_element_at(" +
                s"try_element_at(__over_lags_null, $off), $n), false) THEN " +
                s"CAST(NULL AS DOUBLE) ELSE " +
                s"try_element_at(try_element_at(__over_lags, $off), $n) END)")
          }
        case "LEAD" =>
          fail("LEAD over a rowtime stream sees no future rows (the frame " +
            "ends at CURRENT ROW) — Flink's streaming runtime has no " +
            "rowtime LEAD either; restructure with LAG on the later row, " +
            "or compute leads in a downstream batch pass")
      }
      (m.start, end, out)
    }
    if (repl.isEmpty) fail("no supported aggregate found " +
      "(SUM/AVG/COUNT(*)/MIN/MAX/FIRST_VALUE/LAST_VALUE/STDDEV*/VAR*/LAG, " +
      "and ROW_NUMBER on the unbounded ROWS frame)")

    // splice replacements + strip the WINDOW clause, back to front
    val cuts = (repl ++ stripSpan.map { case (a, b) => (a, b, "") }.toList)
      .sortBy(-_._1)
    var text = select
    cuts.foreach { case (a, b, out) => text = text.substring(0, a) + out + text.substring(b) }
    if (raw"(?is)\bOVER\s*\(".r.findFirstIn(text).isDefined ||
        windowName.exists(n => raw"(?is)\bOVER\s+$n\b".r.findFirstIn(text).isDefined))
      fail("only SUM/AVG/COUNT(*)/MIN/MAX/FIRST_VALUE/LAST_VALUE/STDDEV*/" +
        "VAR*/LAG/ROW_NUMBER window aggregates are supported over a stream; " +
        "rewrite the remaining OVER expression")

    // ---- the row-id column: first plain select item that is neither a
    // partition column nor the rowtime ----
    val selM = raw"(?is)^\s*SELECT\s+".r.findFirstMatchIn(text)
      .getOrElse(fail("the statement must be a SELECT"))
    // top-level FROM (aggregate parens are replaced, but scan depth anyway)
    var depth = 0
    var fromAt = -1
    var j = selM.end
    while (j < text.length && fromAt < 0) {
      val c = text.charAt(j)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == 'f' || c == 'F') &&
          text.regionMatches(true, j, "FROM", 0, 4) &&
          (j == 0 || !isWordChar(text.charAt(j - 1))) &&
          (j + 4 >= text.length || !isWordChar(text.charAt(j + 4))))
        fromAt = j
      j += 1
    }
    if (fromAt < 0) fail("no FROM clause found")
    val items = {
      val list = text.substring(selM.end, fromAt)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var d = 0
      var start = 0
      var k = 0
      while (k < list.length) {
        val c = list.charAt(k)
        if (c == '(') d += 1
        else if (c == ')') d -= 1
        else if (c == ',' && d == 0) { out += list.substring(start, k); start = k + 1 }
        k += 1
      }
      out += list.substring(start)
      out.toList.map(_.trim)
    }
    val plainRe = raw"(?is)^([`\w.]+)(?:\s+AS\s+\w+)?$$".r
    val plain = items.flatMap(plainRe.findFirstMatchIn(_)).map(m => bare(m.group(1)))
      .filterNot(_.startsWith("__over_")) // the spliced aggregate references
    def isKeyOrTime(c: String): Boolean =
      partCols.exists(_.equalsIgnoreCase(c)) || c.equalsIgnoreCase(orderCol)
    val idCol = plain.find(!isKeyOrTime(_))
      .getOrElse(fail("select the row's unique integral id column as a plain " +
        "item — the deterministic per-row order key (Flink orders equal " +
        "rowtimes by input order; a keyed stream needs an explicit key)"))
    plain.filterNot(isKeyOrTime)
      .find(!_.equalsIgnoreCase(idCol))
      .foreach(extra => fail(s"plain select items may be partition columns, " +
        s"the rowtime, and ONE row-id column (saw '$idCol' and '$extra')"))
    // COUNT(*)/ROW_NUMBER alone need no value column (the kernel runs on 0.0)

    // ---- after the top-level FROM: exactly '<source> [alias]'. The
    // outer projection re-applies over the kernel OUTPUT, so any WHERE /
    // GROUP BY / join here would evaluate after the window — silently
    // different frames than Flink's filter-before-window. Reject typed.
    val after = text.substring(fromAt + 4)
    val srcM = raw"(?s)^\s*(`[^`]+`|[\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s*$$".r
      .findFirstMatchIn(after).getOrElse(
        fail("after FROM only '<source> [alias]' is supported — a WHERE / " +
          "GROUP BY / join there would apply AFTER the window aggregation " +
          "(Flink filters before it); put the predicate in a view feeding " +
          "the source, or aggregate the sink downstream"))
    val keywords = Set("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "JOIN",
      "UNION", "WINDOW", "ON", "LEFT", "RIGHT", "INNER", "FULL", "CROSS")
    Option(srcM.group(2)).map(_.toUpperCase).filter(keywords.contains).foreach(k =>
      fail(s"after FROM only '<source> [alias]' is supported (saw '$k ...') — " +
        "a WHERE / GROUP BY / join there would apply AFTER the window " +
        "aggregation (Flink filters before it); put the predicate in a view " +
        "feeding the source, or aggregate the sink downstream"))
    val fromTable = bare(srcM.group(1))
    val span = (fromAt + 4 + srcM.start(1), fromAt + 4 + srcM.end(1))

    Spec(partCols, orderCol, frame, valueCols.toSeq, idCol, text, usesRn,
      maxLag, distinctSlots.toSeq, fromTable, span, stringCols.toSeq,
      tsCols.toSeq, distinctStrSlots.toSeq, Option(srcM.group(2)))
  }

  private def requireIntegral(schema: StructType, c: String, role: String): StructField = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(c))
      .getOrElse(fail(s"$role column '$c' is not a source column"))
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType => f
      case t => fail(s"$role column '$c' must be integral (BYTE/SHORT/INT/BIGINT), is ${t.sql}")
    }
  }

  /** A partition-key column must survive the JSON key round-trip
    * loss-free: integral, string, boolean, and date do; fractional
    * types don't (text round-trip), so they reject typed.
    */
  private def requireKeyable(schema: StructType, c: String): StructField = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(c))
      .getOrElse(fail(s"PARTITION BY column '$c' is not a source column"))
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           BooleanType | DateType => f
      case t => fail(s"PARTITION BY column '$c' must be integral, string, " +
        s"boolean, or date (loss-free key round-trip), is ${t.sql}")
    }
  }

  /** Lower the statement onto the keyed OverOps kernel: build the
    * OverIn stream from the (already stream-bound, watermarked) source
    * view — the PARTITION BY tuple JSON-encoded as the kernel's opaque
    * string key — run the frame's process, decode the key back to the
    * original columns, and re-apply the outer projection over the
    * kernel's output view. Returns the streaming DataFrame for the
    * generic sink path.
    */
  /** `sourceDf` overrides the table lookup for `source` — the proc-time
    * deploy passes `spark.table(src).withWatermark(...)` directly so the
    * user's view registration is never mutated (a replaced temp view
    * would pin a frozen analyzed plan and leak the watermark into
    * unrelated queries on the same name).
    */
  def lower(spark: SparkSession, select: String, source: String,
      rowtimeCol: String, sourceDf: Option[DataFrame] = None): DataFrame = {
    import graft.streaming.{OverIn, OverOps}
    val srcSchema = sourceDf.getOrElse(spark.table(source)).schema
    val spec = parse(select,
      c => srcSchema.fields
        .exists(f => f.name.equalsIgnoreCase(c) && f.dataType == StringType),
      c => srcSchema.fields
        .exists(f => f.name.equalsIgnoreCase(c) && f.dataType == TimestampType),
      c => srcSchema.fields
        .exists(f => f.name.equalsIgnoreCase(c) && f.dataType == DateType))
    if (!spec.orderCol.equalsIgnoreCase(rowtimeCol))
      fail(s"ORDER BY '${spec.orderCol}' must be the deployment's time " +
        s"attribute ('$rowtimeCol') — the declared watermark rowtime, or a " +
        "computed PROCTIME() column for proc-time OVER")
    if (!spec.fromTable.equalsIgnoreCase(bare(source)))
      fail(s"FROM '${spec.fromTable}' does not reference the deployment's " +
        s"single watermarked source '$source'")
    val src = sourceDf.getOrElse(spark.table(source))
    val schema = src.schema
    val partFs = spec.partCols.map(requireKeyable(schema, _))
    val idF = requireIntegral(schema, spec.idCol, "row-id")
    val orderF = schema.fields.find(_.name.equalsIgnoreCase(spec.orderCol))
      .getOrElse(fail(s"rowtime column '${spec.orderCol}' is not a source column"))
    // the aggregates' value columns ride the kernel as ONE vector, one
    // slot per distinct column (parse assigned the element_at indices);
    // COUNT/ROW_NUMBER-only statements carry a single zero slot. The
    // vector is DOUBLE, so non-numeric columns fail TYPED here — a
    // string/timestamp FIRST_VALUE would otherwise silently null (and
    // every result comes back DOUBLE: the documented value subset)
    spec.valueCols.foreach { v =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(v))
        .getOrElse(fail(s"value column '$v' is not a source column"))
      f.dataType match {
        case _: NumericType => ()
        // a timestamp slot the PARSE routed here (MIN/MAX/FIRST/LAST/
        // LAG cast back at the splice; COUNT/COUNT DISTINCT never
        // decode the value) rides as exact unix millis; timestamps
        // reaching arithmetic aggregates were already rejected in parse
        case TimestampType | DateType => ()
        // a string slot the PARSE routed here carries only its NULL
        // mask (COUNT(string_col) — arithmetic over strings was
        // already rejected in parse)
        case StringType => ()
        case t => fail(s"aggregate value column '$v' is ${t.sql} — the " +
          "streaming kernel carries arithmetic values as a DOUBLE vector, " +
          "so only numeric columns deploy there (results come back " +
          "DOUBLE); COUNT/MIN/MAX/FIRST_VALUE/LAST_VALUE/LAG also accept " +
          "STRING and TIMESTAMP columns (string slot vector / exact " +
          "unix-millis encoding)")
      }
    }
    // values ride the kernel as a PRIMITIVE double vector; SQL null
    // semantics ride a parallel mask (a null element in Seq[Double]
    // fails the encoder's not-null assert) — masked slots carry 0.0
    // and the kernels skip them per slot
    // timestamp slots encode as exact unix millis (a plain double cast
    // would give fractional SECONDS); everything else casts to double
    def slotExpr(v: String) =
      srcSchema.fields.find(_.name.equalsIgnoreCase(v)).map(_.dataType) match {
        case Some(TimestampType) => unix_millis(col(v)).cast("double")
        case Some(DateType) => unix_date(col(v)).cast("double")
        // string slots carry only their NULL mask (COUNT): value 0.0,
        // nullness preserved — a plain cast would null non-numeric text
        case Some(StringType) => when(col(v).isNotNull, lit(0.0))
        case _ => col(v).cast("double")
      }
    val valueExpr =
      if (spec.valueCols.isEmpty) array(lit(0.0))
      else array(spec.valueCols.map(v => coalesce(slotExpr(v), lit(0.0))): _*)
    // null-free rows (the common case) ship the EMPTY mask — the
    // kernels' no-nulls fast path; only rows actually carrying a null
    // pay for a populated mask array
    val emptyMask = expr("CAST(array() AS ARRAY<BOOLEAN>)")
    val nullsExpr =
      if (spec.valueCols.isEmpty) emptyMask
      else when(spec.valueCols.map(v => isnull(col(v))).reduce(_ or _),
        array(spec.valueCols.map(v => isnull(col(v))): _*)).otherwise(emptyMask)
    // STRING slots (FIRST/LAST_VALUE and LAG over string columns):
    // verified StringType here so a non-string, non-numeric column
    // still fails typed below
    spec.stringCols.foreach { c =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        fail(s"string value column '$c' is not a source column"))
      if (f.dataType != StringType)
        fail(s"string slot column '$c' resolved ${f.dataType.sql} — internal routing error")
    }
    val svaluesExpr =
      if (spec.stringCols.isEmpty) expr("CAST(array() AS ARRAY<STRING>)")
      else array(spec.stringCols.map(col(_)): _*)
    implicit val enc: org.apache.spark.sql.Encoder[OverIn] =
      org.apache.spark.sql.Encoders.product[OverIn]
    val keySchema = StructType(partFs)
    val in = src.select(
      to_json(struct(partFs.map(f => col(f.name)): _*)).as("key"),
      col(spec.idCol).cast("long").as("id"),
      unix_millis(col(spec.orderCol).cast("timestamp")).as("ts_ms"),
      valueExpr.as("values"),
      nullsExpr.as("nulls"),
      svaluesExpr.as("svalues")).as[OverIn]
    val dStr = spec.distinctStrSlots.map(_ - 1).toSet
    // STATE_TTL hint (FLIP-292) recorded for the OVER's single input —
    // by table name or FROM alias, Flink's StateTtlHint keying. The
    // kernels honor it as EVENT-TIME idle-key expiry (Spark's TTLConfig
    // is processing-time-only and rejected in event-time mode — see
    // StreamingOverProcess's scaladoc for the documented delta).
    val ttlMs = FlinkHints.stateTtlOf(spark, bare(source))
      .orElse(spec.fromAlias.flatMap(a => FlinkHints.stateTtlOf(spark, a)))
      .getOrElse(0L)
    val (out, pre) = spec.frame match {
      case RangeMs(ms) =>
        (OverOps.boundedRangeAgg(in, ms, lagMax = spec.maxLag,
          distinctSlots = spec.distinctSlots.map(_ - 1).toSet,
          distinctStrSlots = dStr, stateTtlMs = ttlMs).toDF(), "range")
      case RowsN(n) =>
        (OverOps.boundedRowsAgg(in, n, lagMax = spec.maxLag,
          distinctSlots = spec.distinctSlots.map(_ - 1).toSet,
          distinctStrSlots = dStr, stateTtlMs = ttlMs).toDF(), "range")
      case UnboundedRows =>
        (OverOps.runningAgg(in, peerGrouped = false, lagMax = spec.maxLag,
          distinctSlots = spec.distinctSlots.map(_ - 1).toSet,
          distinctStrSlots = dStr, stateTtlMs = ttlMs).toDF(), "running")
      case UnboundedRange =>
        (OverOps.runningAgg(in, peerGrouped = true, lagMax = spec.maxLag,
          distinctSlots = spec.distinctSlots.map(_ - 1).toSet,
          distinctStrSlots = dStr, stateTtlMs = ttlMs).toDF(), "running")
    }
    val restoreCols =
      partFs.map(f => from_json(col("key"), keySchema).getField(f.name).as(f.name)) ++
      Seq(
        col("id").cast(idF.dataType).as(idF.name),
        timestamp_millis(col("ts_ms")).cast(orderF.dataType).as(orderF.name),
        col(s"${pre}_sum").as("__over_sum"),
        col(s"${pre}_cnt").as("__over_cnt"),
        col(s"${pre}_min").as("__over_min"),
        col(s"${pre}_max").as("__over_max"),
        col("first_v").as("__over_first"),
        col("last_v").as("__over_last"),
        col("sumsq").as("__over_sumsq"),
        col("nn_cnt").as("__over_nn"),
        col("first_null").as("__over_first_null"),
        col("last_null").as("__over_last_null")) ++
      (if (spec.usesRn) Seq(col("rn").as("__over_rn")) else Nil) ++
      (if (spec.maxLag > 0)
        Seq(col("lags").as("__over_lags"),
          col("lags_null").as("__over_lags_null")) ++
          (if (spec.stringCols.nonEmpty)
            Seq(col("lags_s").as("__over_lags_s")) else Nil)
      else Nil) ++
      (if (spec.stringCols.nonEmpty)
        Seq(col("first_s").as("__over_first_s"),
          col("last_s").as("__over_last_s"),
          col("min_s").as("__over_min_s"),
          col("max_s").as("__over_max_s"))
      else Nil) ++
      (if (spec.distinctSlots.nonEmpty)
        Seq(col("dist_sum").as("__over_dsum"), col("dist_cnt").as("__over_dcnt"),
          col("dist_sumsq").as("__over_dsumsq"))
      else Nil) ++
      (if (spec.distinctStrSlots.nonEmpty)
        Seq(col("dcnt_s").as("__over_dcnt_s"))
      else Nil)
    val restored = out.select(restoreCols: _*)
    restored.createOrReplaceTempView("__graft_over")
    // outer projection: the original statement with agg spans replaced,
    // re-pointed at the kernel's output view — by splicing exactly the
    // FROM table-reference span parse() located, so a same-named column,
    // alias, or string literal elsewhere in the text is never touched
    val outer = spec.rewritten.substring(0, spec.fromSpan._1) + "__graft_over" +
      spec.rewritten.substring(spec.fromSpan._2)
    val parser = new GraftSqlParser(spark, spark.sessionState.sqlParser)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, parser.parsePlan(outer))
  }
}
