package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Flink's event-time temporal join SQL surface ([U] flink-table-planner
  * SqlSnapshot / `FOR SYSTEM_TIME AS OF`; runtime
  * TemporalRowTimeJoinOperator; SURVEY.md §2.3 "temporal/as-of join"):
  *
  * {{{
  * SELECT o.id, o.amount, r.rate
  * FROM orders AS o
  * JOIN rates FOR SYSTEM_TIME AS OF o.ts AS r
  *   ON r.currency = o.currency
  * }}}
  *
  * Lowered onto [[graft.operators.AsOfJoin.backward]] (the
  * union + last-value-carry-forward plan — one hash shuffle on the key,
  * no broadcast of the versioned side): each left row joins the LATEST
  * right version with `right.rowtime <= left rowtime` per key. INNER
  * drops version-less left rows; LEFT [OUTER] keeps them with nulls —
  * both per the reference's semantics.
  *
  * The versioned side's rowtime column is taken from its DDL-declared
  * watermark ([[FlinkDdl.watermarkOf]]) when the table came from
  * connector DDL, else it defaults to the same column name the AS OF
  * expression uses (documented subset; clear error if absent).
  *
  * Subset (clear error outside it): two named tables/views (derived
  * tables: pre-compose a temp view); ON must be a conjunction of
  * same-named key equalities `r.k = l.k`; the versioned side's non-key
  * columns must not collide with left column names.
  */
object SystemTimeJoin {

  private val clauseRe = raw"(?is)\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b".r

  private val joinRe = (
    raw"(?is)^\s*SELECT\s+(.*?)\s+FROM\s+([A-Za-z_]\w*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+" +
    raw"(LEFT\s+(?:OUTER\s+)?)?JOIN\s+([A-Za-z_]\w*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+" +
    raw"([A-Za-z_]\w*)\.([A-Za-z_]\w*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+ON\s+(.*?)" +
    raw"(\s+WHERE\s+.*)?\s*$$").r

  private val condRe =
    raw"(?is)^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$$".r

  def containsClause(sqlText: String): Boolean = clauseRe.findFirstIn(sqlText).isDefined

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"FOR SYSTEM_TIME AS OF: $msg")

  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger()

  def sql(session: SparkSession, sqlText: String): DataFrame = {
    val m = joinRe.findFirstMatchIn(sqlText).getOrElse(fail(
      "supported shape: SELECT ... FROM l [AS a] [LEFT] JOIN r FOR SYSTEM_TIME AS OF a.ts [AS b] ON b.k = a.k [AND ...] [WHERE ...]"))
    val (selectList, leftTable, leftAliasOpt, leftOuter, rightTable) =
      (m.group(1), m.group(2), Option(m.group(3)), m.group(4) != null, m.group(5))
    val (asOfQual, asOfCol, rightAliasOpt, onText, whereOpt) =
      (m.group(6), m.group(7), Option(m.group(8)), m.group(9), Option(m.group(10)))
    val leftAlias = leftAliasOpt.getOrElse(leftTable)
    val rightAlias = rightAliasOpt.getOrElse(rightTable)
    if (asOfQual != leftAlias)
      fail(s"AS OF must reference the probe side ($leftAlias), got $asOfQual")

    val keys = onText.split(raw"(?i)\s+AND\s+").toSeq.map {
      case condRe(q1, c1, q2, c2) =>
        val sides = Map(q1 -> c1, q2 -> c2)
        if (sides.size != 2 || !sides.contains(leftAlias) || !sides.contains(rightAlias))
          fail(s"ON condition must equate the two sides, got `$q1.$c1 = $q2.$c2`")
        if (sides(leftAlias) != sides(rightAlias))
          fail(s"ON keys must be same-named (got ${sides(rightAlias)} = ${sides(leftAlias)}); rename upstream")
        sides(leftAlias)
      case other => fail(s"unsupported ON condition `$other` (conjunction of key equalities only)")
    }

    val left = session.table(leftTable)
    val right = session.table(rightTable)
    val rightTs = FlinkDdl.watermarkOf(session, rightTable).map(_._1).getOrElse(asOfCol)
    if (!right.columns.contains(rightTs))
      fail(s"versioned table $rightTable has no rowtime column `$rightTs` " +
        "(declare a WATERMARK in its DDL or name the columns alike)")
    keys.foreach { k =>
      if (!left.columns.contains(k) || !right.columns.contains(k))
        fail(s"join key `$k` must exist on both sides")
    }
    val rightVals = right.columns.toSeq.filterNot(keys.contains).filterNot(_ == rightTs)
    rightVals.find(left.columns.contains).foreach { c =>
      fail(s"versioned column `$c` collides with a probe-side column; rename upstream")
    }

    // carry the version's rowtime too: INNER semantics = a version existed
    val marked = right.withColumn("__version_ts", col(rightTs))
    val joined = graft.operators.AsOfJoin.backward(
      left, marked, keys, asOfCol, rightTs, rightVals :+ "__version_ts")
    val result = if (leftOuter) joined.drop("__version_ts")
      else joined.filter(col("__version_ts").isNotNull).drop("__version_ts")

    // hand the select list / WHERE back to the SQL parser over the join
    // result (alias qualifiers now refer to one flat row shape)
    val view = s"__system_time_join_${viewCounter.incrementAndGet()}"
    result.createOrReplaceTempView(view)
    val aliases = Set(leftAlias.toLowerCase, rightAlias.toLowerCase)
    val cleanSelect = stripQualifiers(selectList, aliases)
    val cleanWhere = whereOpt.map(stripQualifiers(_, aliases)).getOrElse("")
    session.sql(s"SELECT $cleanSelect FROM $view$cleanWhere")
  }

  /** Remove `alias.` qualifiers outside single-quoted literals. A
    * literal-aware token scan, not a regex: `'c.x'` with left alias `c`
    * stays intact, and only a whole identifier equal to an alias
    * followed by `.` is dropped (case-insensitive, like SQL names).
    */
  private[graft] def stripQualifiers(text: String, aliases: Set[String]): String = {
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'') {
        // copy the quoted literal verbatim ('' is an escaped quote)
        sb += c; i += 1
        var closed = false
        while (i < text.length && !closed) {
          sb += text.charAt(i)
          if (text.charAt(i) == '\'') {
            if (i + 1 < text.length && text.charAt(i + 1) == '\'') { sb += '\''; i += 1 }
            else closed = true
          }
          i += 1
        }
      } else if ((c.isLetter || c == '_') &&
          (i == 0 || !isWordChar(text.charAt(i - 1)))) {
        var j = i
        while (j < text.length && isWordChar(text.charAt(j))) j += 1
        val word = text.substring(i, j)
        if (j < text.length && text.charAt(j) == '.' && aliases.contains(word.toLowerCase))
          i = j + 1 // drop `alias.`
        else { sb ++= word; i = j }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
