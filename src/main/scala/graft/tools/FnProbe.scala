package graft.tools
import graft.{FlinkSql, GraftSession}
object FnProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "fn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val exprs = Seq(
      "STR_TO_MAP('a=1,b=2', ',', '=')['a']",
      "PARSE_URL('http://h/p?q=1', 'HOST')",
      "REGEXP('abc', 'b')",
      "LOCATE('b', 'abc')",
      "POSITION('b' IN 'abc')",
      "OVERLAY('abcd' PLACING 'xx' FROM 2)",
      "INITCAP('hi there')",
      "DATE_FORMAT(TIMESTAMP '2024-01-02 03:04:05', 'yyyy-MM-dd')",
      "TIMESTAMPADD(DAY, 1, TIMESTAMP '2024-01-02 03:04:05')",
      "TIMESTAMPDIFF(HOUR, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-02 03:00:00')",
      "FROM_UNIXTIME(0)",
      "UNIX_TIMESTAMP('2024-01-02 03:04:05')",
      "CURRENT_ROW_TIMESTAMP()",
      "NOW()",
      "CHAR_LENGTH('abc')",
      "CHARACTER_LENGTH('abc')",
      "TYPEOF(1)",
      "E()",
      "LN(10)",
      "LOG2(8)",
      "COT(1.0)",
      "DEGREES(3.14)",
      "IFNULL(NULL, 2)",
      "IS_JSON('{}')",
      "JSON_STRING(1)",
      "JSON_OBJECT('k' VALUE 1)",
      "JSON_OBJECT(KEY 'a' VALUE 1, 'b' VALUE 'x')",
      "JSON_ARRAY(1, 2)",
      "MAP_FROM_ARRAYS(ARRAY[1,2], ARRAY['a','b'])[1]",
      "ARRAY_CONTAINS(ARRAY[1,2], 2)",
      "CARDINALITY(ARRAY[1,2])",
      "ELEMENT(ARRAY[7])",
      "BTRIM('  x  ')",
      "REGEXP_INSTR('abc', 'b')",
      "REGEXP_SUBSTR('abc', 'b.')",
      "SPLIT('a,b', ',')[1]",
      "ENCODE('x', 'UTF-8')",
      "DECODE(ENCODE('x', 'UTF-8'), 'UTF-8')",
      "DATEDIFF(DATE '2024-01-03', DATE '2024-01-01')",
      "HEX(255)",
      "UUID() IS NOT NULL",
      "PERCENT_RANK() OVER (ORDER BY 1)",
      "IS_JSON('not json')",
      "IS_JSON('null')",
      "JSON_STRING('abc')",
      "JSON_STRING(MAP['k', 1])",
      "JSON_ARRAY(1, 2, 3)",
      "ELEMENT(ARRAY[42])",
      "MAP['a', 1, 'b', 2]['b']",
      "ARRAY[ARRAY[1], ARRAY[2]][1][1]",
      "ARRAY['it''s', 'fine'][1]"
    )
    exprs.foreach { e =>
      val r = try {
        val v = FlinkSql.sql(spark, s"SELECT $e AS v").head()
        s"OK    ${v.get(0)}"
      } catch { case t: Throwable => s"FAIL  ${t.getMessage.takeWhile(_ != '\n').take(100)}" }
      println(f"[fn] ${e.take(60)}%-62s $r")
    }
    spark.stop()
  }
}
