package graft.plans

import org.apache.spark.sql.SparkSession

/** Flink's key-value query hints — `LOOKUP` (FLIP-221, [U]
  * flink-table-planner `hint/LookupJoinHintOptions`) and `STATE_TTL`
  * (FLIP-292, [U] `hint/StateTtlHint`) — whose `'k'='v'` argument syntax
  * Spark's hint grammar cannot parse, so they must be consumed by the
  * dialect chain before the statement reaches Spark.
  *
  * `LOOKUP('table'='dim', ...)`: Flink tunes how the lookup join probes
  * the dimension table (sync/async, ordered/unordered, retry on miss).
  * The Spark-first execution of a lookup join is a broadcast of the
  * dimension side — the probe stream never shuffles and every task holds
  * the dim snapshot, which is exactly the data movement Flink's lookup
  * cache avoids — so the hint rewrites to Spark's own `BROADCAST(dim)`
  * hint. The async/retry options are validated with Flink's rules
  * (option names, enum values, duration formats) and then advisory, like
  * Flink treats them on a connector without async support.
  *
  * `STATE_TTL('t'='1d', ...)`: per-input state retention for streaming
  * regular joins / group aggregates. Values are validated as Flink
  * duration strings and recorded per name in session state
  * ([[stateTtlOf]]); the programmatic stateful operators take the same
  * TTL via `transformWithState`'s `TTLConfig` (processing-time based,
  * like Flink's StateTtlConfig — see `streaming/GroupAgg.retractingAgg`),
  * and a streaming OVER INSERT honors the hint through
  * `RowtimeOver.lower` → the OverOps kernels' event-time idle-key
  * expiry (TTLConfig is processing-time-only, rejected in the kernels'
  * event-time mode — MIGRATION.md documents the delta).
  * Spark's stream-stream join state is watermark-evicted, not TTL'd —
  * documented delta; the recorded TTL is advisory there.
  */
object FlinkHints {
  private val lookupRe = raw"(?is)/\*\+\s*LOOKUP\s*\(([^)]*)\)\s*\*/".r
  private val stateTtlRe = raw"(?is)/\*\+\s*STATE_TTL\s*\(([^)]*)\)\s*\*/".r
  private val kvRe = raw"'((?:[^'\\]|\\.)*)'\s*=\s*'((?:[^'\\]|\\.)*)'".r

  def containsClause(sqlText: String): Boolean =
    lookupRe.findFirstIn(sqlText).isDefined ||
      stateTtlRe.findFirstIn(sqlText).isDefined

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Flink hint: $msg")

  /** Flink duration literal → millis ([U] flink-core
    * util/TimeUtils.parseDuration): `'123'` (ms), `'3 s'`, `'12h'`,
    * `'1 d'`; singular/plural long unit names accepted.
    */
  private[graft] def parseDuration(v: String, what: String): Long = {
    val m = raw"(?i)^\s*(\d+)\s*([a-zµ]*)\s*$$".r.findFirstMatchIn(v)
      .getOrElse(fail(s"$what: '$v' is not a duration (like '3 s', '100ms', '1 d')"))
    val digits = m.group(1)
    if (digits.length > 18) fail(s"$what: '$v' is out of range")
    val n = digits.toLong
    // checked multiply: a huge count in a big unit must fail typed, not
    // wrap to a negative TTL
    def mul(factor: Long): Long =
      try java.lang.Math.multiplyExact(n, factor)
      catch { case _: ArithmeticException => fail(s"$what: '$v' is out of range") }
    m.group(2).toLowerCase match {
      // sub-millisecond units round UP to a whole milli (this layer's
      // granularity) so a nonzero duration never collapses to zero
      case "ns" | "nano" | "nanosecond" | "nanoseconds" =>
        if (n == 0) 0L else math.max(1L, (n + 999999L) / 1000000L)
      case "us" | "µs" | "micro" | "microsecond" | "microseconds" =>
        if (n == 0) 0L else math.max(1L, (n + 999L) / 1000L)
      case "" | "ms" | "milli" | "millisecond" | "milliseconds" => n
      case "s" | "sec" | "second" | "seconds" => mul(1000L)
      case "min" | "minute" | "minutes" => mul(60000L)
      case "h" | "hour" | "hours" => mul(3600000L)
      case "d" | "day" | "days" => mul(86400000L)
      case u => fail(s"$what: unknown duration unit '$u' in '$v'")
    }
  }

  // LookupJoinHintOptions: the option table Flink validates against
  private val lookupKeys = Set("table", "async", "output-mode", "capacity",
    "timeout", "retry-predicate", "retry-strategy", "fixed-delay", "max-attempts")

  private def validateLookup(opts: Map[String, String]): String = {
    opts.keys.find(!lookupKeys.contains(_)).foreach(k =>
      fail(s"LOOKUP does not support option '$k' " +
        s"(supported: ${lookupKeys.toSeq.sorted.mkString(", ")})"))
    val table = opts.getOrElse("table", fail("LOOKUP requires 'table'"))
    opts.get("async").foreach(v =>
      if (!Set("true", "false").contains(v.toLowerCase))
        fail(s"LOOKUP 'async' must be true/false, got '$v'"))
    opts.get("output-mode").foreach(v =>
      if (!Set("ordered", "allow_unordered").contains(v.toLowerCase))
        fail(s"LOOKUP 'output-mode' must be ordered/allow_unordered, got '$v'"))
    Seq("capacity", "max-attempts").foreach(k => opts.get(k).foreach(v =>
      if (!v.matches(raw"\d{1,10}") || v.toLong <= 0 || v.toLong > Int.MaxValue)
        fail(s"LOOKUP '$k' must be a positive integer, got '$v'")))
    Seq("timeout", "fixed-delay").foreach(k =>
      opts.get(k).foreach(parseDuration(_, s"LOOKUP '$k'")))
    opts.get("retry-predicate").foreach(v =>
      if (v.toLowerCase != "lookup_miss")
        fail(s"LOOKUP 'retry-predicate' must be lookup_miss, got '$v'"))
    opts.get("retry-strategy").foreach(v =>
      if (v.toLowerCase != "fixed_delay")
        fail(s"LOOKUP 'retry-strategy' must be fixed_delay, got '$v'"))
    // `cat.db.dim` hints the same table a qualified reference resolves
    // to — the broadcast target is the physical (last) name part
    table.split('.').last
  }

  private val ttlBySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Long]]()
  private def ttlRegistry(spark: SparkSession) = ttlBySession.synchronized {
    var r = ttlBySession.get(spark)
    if (r == null) {
      r = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      ttlBySession.put(spark, r)
    }
    r
  }

  /** The STATE_TTL recorded for `name` (table or alias) by the most
    * recently parsed statement, as millis — the deployment-layer analog
    * of Flink's per-input StateTtlConfig. Flink's StateTtlHint is
    * per-query scope, so the registry is cleared at each statement parse
    * ([[clearStateTtl]]); a TTL never leaks onto a later statement that
    * happens to reuse the same alias.
    */
  def stateTtlOf(spark: SparkSession, name: String): Option[Long] =
    Option(ttlRegistry(spark).get(name.toLowerCase))

  /** Reset the per-statement STATE_TTL scope — called by the dialect
    * parser at the start of every statement rewrite.
    */
  def clearStateTtl(spark: SparkSession): Unit = ttlRegistry(spark).clear()

  /** Consume every LOOKUP / STATE_TTL hint in `sqlText`: validate with
    * Flink's option rules, record STATE_TTL durations, and leave either
    * Spark's `BROADCAST(dim)` (for LOOKUP) or nothing (for STATE_TTL)
    * in the comment's place.
    */
  def rewrite(spark: SparkSession, sqlText: String): String = {
    val afterLookup = lookupRe.replaceAllIn(sqlText, m => {
      val opts = kvRe.findAllMatchIn(m.group(1))
        .map(o => o.group(1).toLowerCase -> o.group(2)).toMap
      val dim = validateLookup(opts)
      java.util.regex.Matcher.quoteReplacement(s"/*+ BROADCAST($dim) */")
    })
    stateTtlRe.replaceAllIn(afterLookup, m => {
      val pairs = kvRe.findAllMatchIn(m.group(1))
        .map(o => o.group(1) -> o.group(2)).toSeq
      if (pairs.isEmpty) fail("STATE_TTL needs at least one 'table'='duration' pair")
      pairs.foreach { case (name, dur) =>
        if (!name.matches(raw"[A-Za-z_][\w.]*"))
          fail(s"STATE_TTL key '$name' is not a table name or alias")
        ttlRegistry(spark).put(name.split('.').last.toLowerCase,
          parseDuration(dur, s"STATE_TTL '$name'"))
      }
      " "
    })
  }
}
