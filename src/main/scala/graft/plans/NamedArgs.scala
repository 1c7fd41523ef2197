package graft.plans

import org.apache.spark.sql.SparkSession

/** Named arguments for bridged `CREATE FUNCTION` invocations — Flink's
  * FLIP-387 convention `f(pname => expr, ...)` ([U] flink-table-common
  * `annotation/ArgumentHint`), normalized to positional order BEFORE
  * Spark parses the statement, exactly like the window TVFs' named
  * parameters. Only invocations of functions recorded in
  * [[graft.functions.FunctionParams]] rewrite (the reflective
  * scalar/table bridges record `eval`'s reflected parameter names at
  * registration); everything else — lambdas use `->` in Spark, and `=>`
  * appears nowhere else in the dialect — passes through untouched.
  * All-or-nothing per invocation: mixing named and positional, unknown
  * or duplicate names, a missing REQUIRED name, or a class compiled
  * without `-parameters` (and without per-parameter @ArgumentHint
  * names) all fail typed. Parameters marked optional by a duck-typed
  * `@ArgumentHint(isOptional = true)` may be omitted from a named
  * call — their positional slot fills SQL NULL.
  */
object NamedArgs {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"named arguments: $msg")

  /** Cheap probe: a top-level `=>` token anywhere in the text. */
  def containsClause(sqlText: String): Boolean = sqlText.contains("=>")

  private val namedItemRe = raw"(?s)^([A-Za-z_]\w*)\s*=>\s*(.+)$$".r
  private val callRe = raw"(?i)\b([A-Za-z_]\w*)\s*\(".r

  /** Per-character string-literal mask of `s` under Spark SQL's literal
    * rules: single- AND double-quoted literals, backslash escapes, and
    * doubled-quote escapes (`''` / `""`) all stay inside one literal.
    * Shared by the call-site scan here and the CALL argument splitter
    * (ReflectiveProcedure) so the two can never drift.
    */
  private[graft] def literalMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var q: Char = 0 // 0 = outside a literal, else the opening quote char
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q == 0) {
        if (c == '\'' || c == '"') { q = c; mask(i) = true }
      } else {
        mask(i) = true
        if (c == '\\' && i + 1 < s.length) { mask(i + 1) = true; i += 1 }
        else if (c == q) {
          if (i + 1 < s.length && s.charAt(i + 1) == q) { mask(i + 1) = true; i += 1 }
          else q = 0
        }
      }
      i += 1
    }
    mask
  }

  /** Split an argument list on top-level commas (quote- and
    * paren-aware; literal rules per [[literalMask]]).
    */
  private[graft] def splitTopLevel(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val mask = literalMask(s)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      if (!mask(i)) s.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toList.map(_.trim)
  }

  def rewrite(spark: SparkSession, sqlText: String): String = {
    if (!containsClause(sqlText)) return sqlText
    var text = sqlText
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false
      guard += 1
      // quote-aware call-site scan: a registered name + `=>` inside a
      // string LITERAL is data, not an invocation — skip any match whose
      // span lies inside a quoted region
      val mask = literalMask(text)
      val it = callRe.findAllMatchIn(text)
        .filterNot(m => mask(m.start) || mask(m.end - 1))
      val hit = it.flatMap { m =>
        graft.functions.FunctionParams.defsOf(spark, m.group(1)).map(p => (m, p))
      }.find { case (m, _) =>
        val close = WindowTvf.matchParen(text, m.end - 1)
        splitTopLevel(text.substring(m.end, close))
          .exists(namedItemRe.findFirstMatchIn(_).isDefined)
      }
      hit.foreach { case (m, params) =>
        val fn = m.group(1)
        val close = WindowTvf.matchParen(text, m.end - 1)
        val items = splitTopLevel(text.substring(m.end, close))
        val named = items.map(namedItemRe.findFirstMatchIn(_))
        if (!named.forall(_.isDefined))
          fail(s"$fn(...): arguments must be all positional or all named " +
            "(pname => expr) — mixing is not supported, as in Flink")
        if (params == null)
          fail(s"$fn(...): the registered class was compiled without " +
            "parameter names — rebuild it with `javac -parameters` (or " +
            "an @ArgumentHint(name = ...) per parameter, or call " +
            "positionally)")
        val given = named.map(_.get.group(1).toLowerCase)
        if (given.distinct.length != given.length)
          fail(s"$fn(...): duplicate named argument " +
            given.diff(given.distinct).distinct.mkString(", "))
        val declared = params.map(_.name)
        val unknown = given.filterNot(declared.contains)
        if (unknown.nonEmpty)
          fail(s"$fn(...): unknown named argument${if (unknown.size > 1) "s" else ""} " +
            s"${unknown.mkString("(", ", ", ")")} — declared parameters are " +
            declared.mkString("(", ", ", ")"))
        // FLIP-387 optional parameters ([U] flink-table-common
        // annotation/ArgumentHint#isOptional): a named call may omit
        // them; the positional slot fills SQL NULL, Flink's default-less
        // optional-argument value
        val missing = params.filterNot(p => p.optional || given.contains(p.name))
        if (missing.nonEmpty)
          fail(s"$fn(...): missing required argument" +
            s"${if (missing.size > 1) "s" else ""} " +
            missing.map(_.name).mkString("(", ", ", ")") +
            s" — declared parameters are ${declared.mkString("(", ", ", ")")}")
        val byName = given.zip(named.map(_.get.group(2).trim)).toMap
        val ordered = params.map(p => byName.getOrElse(p.name, "NULL"))
        text = text.substring(0, m.end) + ordered.mkString(", ") +
          text.substring(close)
        changed = true
      }
    }
    text
  }
}
