package graft.plans

/** Flink/SQL-standard collection constructors `ARRAY[...]` / `MAP[k, v,
  * ...]` → Spark's `array(...)` / `map(...)` calls ([U] flink-sql-parser
  * collection constructors; Spark's parser has no bracket form).
  *
  * Hand-rolled quote-aware scan, not a regex: string literals are copied
  * wholesale (a bracket or keyword inside `'...'` is never touched),
  * bracket matching is depth-counted so plain subscripts inside a
  * constructor body (`ARRAY[a[1], 2]`) survive, and bodies are rewritten
  * recursively for nesting (`ARRAY[ARRAY[1]]`). Delta shared with the
  * reference: a column literally named `array`/`map` that is subscripted
  * reads as a constructor — Flink resolves the same way.
  */
object BracketConstructors {

  def containsClause(sqlText: String): Boolean = rewrite(sqlText) != sqlText

  def rewrite(sql: String): String = {
    val out = new StringBuilder
    val n = sql.length
    var i = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        // copy quoted spans wholesale: single-quoted literals, Spark's
        // default-mode double-quoted string literals, and backtick-quoted
        // identifiers may all contain brackets or the ARRAY/MAP keywords
        val end = endOfLiteral(sql, i)
        out.append(sql.substring(i, end))
        i = end
      } else if (c.isLetter) {
        val ws = i
        while (i < n && isWordChar(sql.charAt(i))) i += 1
        val word = sql.substring(ws, i)
        var j = i
        while (j < n && sql.charAt(j).isWhitespace) j += 1
        val isCtor = (word.equalsIgnoreCase("ARRAY") || word.equalsIgnoreCase("MAP")) &&
          j < n && sql.charAt(j) == '['
        if (isCtor) {
          var depth = 1
          var k = j + 1
          val bodyStart = k
          while (k < n && depth > 0) {
            sql.charAt(k) match {
              case '\'' | '"' | '`' => k = endOfLiteral(sql, k) - 1
              case '[' => depth += 1
              case ']' => depth -= 1
              case _ =>
            }
            k += 1
          }
          if (depth != 0)
            throw new IllegalArgumentException(
              s"unbalanced brackets in ${word.toUpperCase}[...] constructor")
          out.append(if (word.equalsIgnoreCase("MAP")) "map" else "array")
            .append('(')
            .append(rewrite(sql.substring(bodyStart, k - 1)))
            .append(')')
          i = k
        } else out.append(word)
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Index just past the span's closing quote, for whichever quote char
    * opened it (doubled-quote escapes included — `''`, `""`, ` `` `).
    */
  private[plans] def endOfLiteral(s: String, start: Int): Int = {
    val q = s.charAt(start)
    var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2
        else return i + 1
      } else i += 1
    }
    s.length
  }
}
