package graft

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}

/** One-call entry point for running Flink SQL text — single statements
  * or whole `;`-separated scripts — on ANY Spark session, extensions or
  * not ([U] flink-table-api TableEnvironment.executeSql; SURVEY.md §3.1).
  *
  * {{{
  * graft.FlinkSql.run(spark, """
  *   CREATE TABLE orders (...) WITH ('connector'='filesystem', ...);
  *   CREATE TABLE sink (...) WITH ('connector'='blackhole');
  *   INSERT INTO sink SELECT ... FROM orders;
  *   SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE), count(*)
  *   FROM orders GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)
  * """)
  * }}}
  *
  * Registers the Flink-named functions, then routes every statement
  * through the full dialect chain ([[graft.plans.GraftSqlParser]]:
  * connector DDL, INSERT INTO sinks, window TVFs, legacy group windows,
  * MATCH_RECOGNIZE, FOR SYSTEM_TIME AS OF) and executes the parsed plan
  * directly, so nothing requires the session to have been built with
  * `spark.sql.extensions`. Returns the LAST statement's DataFrame
  * (DDL/INSERT statements yield Flink-style `OK` result rows).
  *
  * Statement splitting ignores `;` inside single-quoted literals and
  * inside `--` / `/* ... */` comments (an apostrophe in a comment does
  * not open a literal); quoted literals cannot span statements.
  */
object FlinkSql {

  def sql(spark: SparkSession, statement: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val parser = new graft.plans.GraftSqlParser(spark, spark.sessionState.sqlParser)
    GraftColumnBridge.ofRows(spark, parser.parsePlan(statement))
  }

  def run(spark: SparkSession, script: String): DataFrame = {
    val stmts = statements(script)
    require(stmts.nonEmpty, "empty script")
    stmts.map(sql(spark, _)).last
  }

  /** The streaming deployment shape: every statement up to the last
    * runs as in [[run]] (typically connector DDL), and the final
    * statement — which must be `INSERT INTO <ddl sink> SELECT ...` —
    * starts as a Structured Streaming job ([[graft.plans.FlinkDdl
    * .executeInsertStream]]: DDL filesystem sources become watermarked
    * readStreams, the sink a writeStream). Returns the running
    * StreamingQuery; `AvailableNow` by default (process everything
    * present, then stop — await termination for the bounded analog of
    * a Flink batch-mode INSERT).
    */
  def runStream(spark: SparkSession, script: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stmts = statements(script)
    require(stmts.nonEmpty, "empty script")
    stmts.init.foreach(sql(spark, _))
    require(graft.plans.FlinkDdl.isInsert(spark, stmts.last),
      "the last statement of a streaming script must be INSERT INTO a DDL-registered sink")
    graft.plans.FlinkDdl.executeInsertStream(spark, stmts.last, trigger)
  }

  /** Split a script on top-level `;` (quote- and comment-aware: a `;`
    * or `'` inside a `--` line comment or a `/* */` block comment is
    * plain text — comments are copied through for the SQL parser to
    * strip, but never open literals or split statements).
    */
  private[graft] def statements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    def startsWith(s: String): Boolean = script.startsWith(s, i)
    while (i < script.length) {
      val c = script.charAt(i)
      if (!inQuote && startsWith("--")) {
        // line comment: copy to end of line verbatim
        while (i < script.length && script.charAt(i) != '\n') { cur += script.charAt(i); i += 1 }
      } else if (!inQuote && startsWith("/*")) {
        // block comment: copy to the closing */ (or end of script)
        cur ++= "/*"; i += 2
        while (i < script.length && !startsWith("*/")) { cur += script.charAt(i); i += 1 }
        if (i < script.length) { cur ++= "*/"; i += 2 }
      } else {
        c match {
          case '\'' =>
            // '' inside a quoted literal is an escaped quote, not a close
            if (inQuote && i + 1 < script.length && script.charAt(i + 1) == '\'') {
              cur += c; cur += c; i += 1
            } else { inQuote = !inQuote; cur += c }
          case ';' if !inQuote => out += cur.result(); cur.clear()
          case _ => cur += c
        }
        i += 1
      }
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
