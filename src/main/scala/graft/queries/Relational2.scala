package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QueryDefs._

/** Second tranche of the relational surface: window-bucket joins,
  * non-equi joins, UDTF/explode (LATERAL), FIRST/LAST_VALUE, LISTAGG,
  * TRY_CAST — rounding out SURVEY.md §2.3/2.4/2.8/2.9 rows.
  */
object Relational2 {

  /** Windowed join (SURVEY.md §2.3 "Window join"): events co-bucketed into
    * the same 5-minute tumble per user — join on (window, key), the TVF
    * window-join shape. Counts view→click co-occurrences per bucket.
    */
  val q35_windowed_join: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"user_id", $"event_type", $"event_id",
        window($"ts", "5 minutes").getField("start").as("wstart"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"wstart", $"event_id".as("v_id"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"wstart".as("c_w"), $"event_id".as("c_id"))
    v.join(c, $"user_id" === $"c_user" && $"wstart" === $"c_w")
      .groupBy($"user_id", $"wstart")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Theta/non-equi join → nested-loop/broadcast NL (SURVEY.md §2.3):
    * same-nation customers strictly richer than the supplier.
    */
  val q36_theta_join: Q = (s, d) => {
    import s.implicits._
    Tables.supplier(s, d)
      .join(Tables.customer(s, d),
        $"c_nationkey" === $"s_nationkey" && $"c_acctbal" > $"s_acctbal")
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n_richer"))
  }

  /** UDTF / LATERAL TABLE / CROSS JOIN UNNEST (SURVEY.md §2.9): explode
    * p_type words, global word frequencies.
    */
  val q37_explode_unnest: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d)
      .select(explode(split($"p_type", " ")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
  }

  /** FIRST_VALUE / LAST_VALUE / NTH over a total order (SURVEY.md §2.4). */
  val q38_first_last_value: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.supplier(s, d)
      .select($"s_suppkey", $"s_nationkey",
        first($"s_suppkey").over(w).as("richest"),
        last($"s_suppkey").over(w).as("poorest"))
  }

  /** LISTAGG (Flink 1.19 LISTAGG ≙ Spark 4 listagg ≙ DuckDB string_agg). */
  val q39_listagg: Q = (s, d) => {
    import s.implicits._
    Tables.nation(s, d)
      .join(Tables.supplier(s, d), $"n_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(expr("listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)").as("suppliers"),
        count(lit(1)).as("n_sup"))
  }

  /** CAST / TRY_CAST behavior (SURVEY.md §2.8 "Casts"): TRY_CAST yields
    * null on junk where ANSI CAST would error.
    */
  val q40_try_cast: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d)
      .select(
        $"p_partkey",
        expr("try_cast(substring(p_brand, 7, 2) as int)").as("brand_num"),
        expr("try_cast(p_name as int)").as("junk_null"),
        $"p_size".cast("string").as("size_str"),
        // explicit floor: Spark's double→int cast truncates, DuckDB's rounds
        floor($"p_retailprice").cast("int").as("price_int"))
  }

  /** JSON_OBJECTAGG / JSON_ARRAYAGG (SURVEY.md §2.4): composed from
    * collect_list + map_from_entries + to_json, entries sorted for a
    * canonical rendering.
    */
  val q43_json_agg: Q = (s, d) => {
    import s.implicits._
    graft.Tables.customer(s, d)
      .groupBy($"c_nationkey", $"c_mktsegment").agg(count(lit(1)).as("cnt"))
      .groupBy($"c_nationkey")
      .agg(
        to_json(map_from_entries(array_sort(collect_list(struct($"c_mktsegment", $"cnt")))))
          .as("seg_json"),
        to_json(array_sort(collect_list($"c_mktsegment"))).as("seg_arr"))
  }

  /** Second string-function tranche (SURVEY.md §2.8): ascii/chr, left/
    * right, position, base64, starts/contains, printf-style formatting.
    */
  val q44_string_funcs2: Q = (s, d) => {
    import s.implicits._
    graft.Tables.part(s, d).select(
      $"p_partkey",
      ascii($"p_name").as("first_code"),
      expr("chr(65 + p_size % 26)").as("size_chr"),
      expr("left(p_name, 4)").as("l4"),
      expr("right(p_name, 4)").as("r4"),
      expr("position('a' in p_name)").as("a_at"),
      base64($"p_brand".cast("binary")).as("brand_b64"),
      $"p_name".startsWith("b").as("starts_b"),
      $"p_name".contains("spark").as("has_spark"),
      format_string("%s-%d", $"p_brand", $"p_size").as("brand_size"))
  }

  /** Math scalar surface (SURVEY.md §2.8 "Math"): roots, logs, exp,
    * trig, sign, angle conversion — rounded at 6 (libm vs java.lang.Math
    * agree far below that).
    */
  val q46_math_funcs: Q = (s, d) => {
    import s.implicits._
    graft.Tables.part(s, d).select(
      $"p_partkey",
      round(sqrt($"p_retailprice"), 6).as("sq"),
      round(cbrt($"p_retailprice"), 6).as("cb"),
      round(log($"p_retailprice"), 6).as("ln_p"),
      round(log10($"p_retailprice"), 6).as("l10"),
      round(log2($"p_retailprice"), 6).as("l2"),
      round(exp(($"p_size" % 10).cast("double")), 6).as("ex"),
      pow($"p_size", 2).as("p2"),
      round(sin($"p_size"), 6).as("sn"),
      round(cos($"p_size"), 6).as("cs"),
      round(atan($"p_size"), 6).as("at"),
      signum($"p_retailprice" - 1000.0).cast("int").as("sg"),
      round(degrees($"p_size"), 6).as("dg"),
      round(radians($"p_size"), 6).as("rd"),
      ($"p_size" % 7).as("m7"),
      round(lit(math.Pi), 6).as("pi_c"))
  }

  /** One ANSI SQL text, two engines: the `TableEnvironment.executeSql`
    * analog (SURVEY.md §3.1) — temp views + `spark.sql`, with the SAME
    * string serving as the DuckDB oracle. Exercises the SQL entry point,
    * IN-subquery rewrite (RewritePredicateSubquery → semi join), and the
    * full parse→analyze→optimize pipeline.
    */
  val sqlEntryText: String =
    """SELECT c_custkey, c_name, n_name,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      | count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_orderpriority = '1-URGENT')
      |GROUP BY c_custkey, c_name, n_name""".stripMargin

  val q47_sql_entry: Q = (s, d) => {
    Seq("customer", "orders", "lineitem", "nation")
      .foreach(t => graft.Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(sqlEntryText)
  }

  /** Explicit GROUPING SETS (beyond rollup/cube) + exact interpolated
    * median / percentile aggregates (SURVEY.md §2.4).
    *
    * Exact quantiles WITHOUT Spark's `percentile` ObjectAggregate (which
    * collects every group value into one in-memory buffer — the empty
    * grouping set would funnel the whole table through a single reducer).
    * Instead: (1) expand each row into its grouping-set instances (what
    * Catalyst's Expand does for GROUPING SETS), (2) hash-aggregate a
    * value histogram (group, price) -> cnt — at scale prices repeat, so
    * the sorted data is distinct values, not rows, (3) one window pass
    * per group ordered by value computes cumulative counts, (4) a final
    * hash aggregate picks the two straddling values per quantile and
    * interpolates, matching `percentile`/`quantile_cont` semantics
    * (pos = p*(n-1), linear interpolation between floor/ceil ranks).
    * Every stage is a shuffle-parallel hash aggregate or external sort —
    * no single-buffer ObjectAggregate anywhere (locked in PlanSpec).
    */
  val q49_grouping_sets: Q = (s, d) => {
    import s.implicits._
    // (1) manual Expand: one copy of each row per grouping set
    val expanded = graft.Tables.orders(s, d)
      .select($"o_orderstatus", $"o_orderpriority", $"o_totalprice")
      .select(explode(array(
        struct(lit(0).as("gset"), $"o_orderstatus".as("gs"),
          lit(null).cast("string").as("gp"), $"o_totalprice".as("v")),
        struct(lit(1).as("gset"), lit(null).cast("string").as("gs"),
          $"o_orderpriority".as("gp"), $"o_totalprice".as("v")),
        struct(lit(2).as("gset"), lit(null).cast("string").as("gs"),
          lit(null).cast("string").as("gp"), $"o_totalprice".as("v"))
      )).as("g"))
      .select($"g.gset", $"g.gs", $"g.gp", $"g.v")
    // (2) per-group value histogram (map-side partial agg shrinks the shuffle)
    val hist = expanded.groupBy($"gset", $"gs", $"gp", $"v")
      .agg(count(lit(1)).as("cnt"))
    // (3) cumulative + total counts per group
    val grp = Window.partitionBy($"gset", $"gs", $"gp")
    val withCum = hist
      .withColumn("cum", sum($"cnt").over(grp.orderBy($"v")))
      .withColumn("n", sum($"cnt").over(grp))
    // (4) row-level contribution of each distinct value to quantile p:
    // ranks are 0-based; this row covers [cum-cnt, cum-1]; pos = p*(n-1)
    def contrib(p: Double): org.apache.spark.sql.Column = {
      val pos = lit(p) * ($"n" - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      when($"cum" - $"cnt" <= lo && lo < $"cum", $"v" * (lit(1.0) - frac))
        .otherwise(lit(0.0)) +
        when($"cum" - $"cnt" <= hi && hi < $"cum", $"v" * frac)
          .otherwise(lit(0.0))
    }
    withCum.groupBy($"gset", $"gs", $"gp")
      .agg(
        sum($"cnt").as("n"),
        round(sum($"v" * $"cnt"), 2).as("total"),
        round(sum(contrib(0.5)), 4).as("med"),
        round(sum(contrib(0.9)), 4).as("p90"))
      .select($"gs".as("o_orderstatus"), $"gp".as("o_orderpriority"),
        $"n", $"total", $"med", $"p90")
  }

  /** Shared-ANSI-text query: registers views and runs the same string on
    * both engines (see q47).
    */
  private def sharedSql(tables: Seq[String], text: String): Q = (s, d) => {
    tables.foreach(t => graft.Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(text)
  }

  /** FULL OUTER join with coalesced null sides (only LEFT was covered). */
  val fullOuterText: String =
    """WITH c AS (SELECT c_nationkey AS k, count(*) AS cnt FROM customer GROUP BY 1),
      |s AS (SELECT s_nationkey AS k, count(*) AS cnt FROM supplier GROUP BY 1)
      |SELECT coalesce(c.k, s.k) AS nationkey,
      |       coalesce(c.cnt, 0) AS n_cust,
      |       coalesce(s.cnt, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.k = s.k""".stripMargin

  /** Correlated scalar subqueries (beyond EXISTS/IN). */
  val correlatedText: String =
    """SELECT o_orderkey, o_totalprice,
      | (SELECT max(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_qty,
      | (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
      |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin

  /** Correlated aggregate subquery in WHERE (TPC-H Q17-shape decorrelation). */
  val corrAggText: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o1
      |WHERE o_totalprice > (SELECT 1.5 * avg(o_totalprice)
      |                      FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)""".stripMargin

  /** LIKE pattern matching. */
  val likeText: String =
    """SELECT p_partkey,
      | p_name LIKE '%spark%' AS has_spark,
      | p_type LIKE 'a%' AS starts_a,
      | p_name NOT LIKE '%z%' AS no_z
      |FROM part""".stripMargin

  /** TIMESTAMPADD / TIMESTAMPDIFF (Flink's SQL temporal arithmetic). */
  val q53_ts_arith: Q = (s, d) => {
    import s.implicits._
    graft.Tables.orders(s, d).select(
      $"o_orderkey",
      expr("timestampadd(HOUR, 3, o_orderdate)").as("plus3h"),
      expr("timestampadd(WEEK, 2, o_orderdate)").as("plus2w"),
      expr("timestampdiff(DAY, o_orderdate, timestamp_ntz'2002-01-01 00:00:00')").as("days_left"),
      expr("timestampdiff(HOUR, o_orderdate, timestamp_ntz'2002-01-01 00:00:00')").as("hours_left"))
  }

  val queries: Map[String, Q] = Map(
    "q53_ts_arith" -> q53_ts_arith,
    "q50_full_outer" -> sharedSql(Seq("customer", "supplier"), fullOuterText),
    "q51_correlated_subquery" -> sharedSql(Seq("orders", "lineitem"), correlatedText),
    "q52_like_patterns" -> sharedSql(Seq("part"), likeText),
    "q54_corr_agg_subquery" -> sharedSql(Seq("orders"), corrAggText),
    "q49_grouping_sets" -> q49_grouping_sets,
    "q47_sql_entry" -> q47_sql_entry,
    "q46_math_funcs" -> q46_math_funcs,
    "q43_json_agg" -> q43_json_agg,
    "q44_string_funcs2" -> q44_string_funcs2,
    "q35_windowed_join" -> q35_windowed_join,
    "q36_theta_join" -> q36_theta_join,
    "q37_explode_unnest" -> q37_explode_unnest,
    "q38_first_last_value" -> q38_first_last_value,
    "q39_listagg" -> q39_listagg,
    "q40_try_cast" -> q40_try_cast,
  )

  val oracle: Map[String, String] = Map(
    "q53_ts_arith" ->
      """SELECT o_orderkey,
        | o_orderdate + INTERVAL 3 HOUR AS plus3h,
        | o_orderdate + INTERVAL 14 DAY AS plus2w,
        | date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_left,
        | date_diff('hour', o_orderdate, TIMESTAMP '2002-01-01') AS hours_left
        |FROM orders""".stripMargin,
    "q50_full_outer" -> fullOuterText,
    "q51_correlated_subquery" -> correlatedText,
    "q52_like_patterns" -> likeText,
    "q54_corr_agg_subquery" -> corrAggText,
    "q49_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n,
        | round(sum(o_totalprice), 2) AS total,
        | round(median(o_totalprice), 4) AS med,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q47_sql_entry" -> sqlEntryText,
    "q46_math_funcs" ->
      """SELECT p_partkey,
        | round(sqrt(p_retailprice), 6) AS sq,
        | round(cbrt(p_retailprice), 6) AS cb,
        | round(ln(p_retailprice), 6) AS ln_p,
        | round(log10(p_retailprice), 6) AS l10,
        | round(log2(p_retailprice), 6) AS l2,
        | round(exp(CAST(p_size % 10 AS DOUBLE)), 6) AS ex,
        | pow(p_size, 2) AS p2,
        | round(sin(p_size), 6) AS sn,
        | round(cos(p_size), 6) AS cs,
        | round(atan(p_size), 6) AS at,
        | CAST(sign(p_retailprice - 1000.0) AS INTEGER) AS sg,
        | round(degrees(p_size), 6) AS dg,
        | round(radians(p_size), 6) AS rd,
        | p_size % 7 AS m7,
        | round(pi(), 6) AS pi_c
        |FROM part""".stripMargin,
    "q43_json_agg" ->
      """WITH per AS (SELECT c_nationkey, c_mktsegment, count(*) AS cnt
        |             FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey,
        | '{' || string_agg('"' || c_mktsegment || '":' || cnt, ',' ORDER BY c_mktsegment) || '}' AS seg_json,
        | '[' || string_agg('"' || c_mktsegment || '"', ',' ORDER BY c_mktsegment) || ']' AS seg_arr
        |FROM per GROUP BY c_nationkey""".stripMargin,
    "q44_string_funcs2" ->
      """SELECT p_partkey,
        | CAST(ascii(p_name) AS INTEGER) AS first_code,
        | chr(65 + p_size % 26) AS size_chr,
        | left(p_name, 4) AS l4,
        | right(p_name, 4) AS r4,
        | CAST(position('a' IN p_name) AS INTEGER) AS a_at,
        | to_base64(CAST(p_brand AS BLOB)) AS brand_b64,
        | starts_with(p_name, 'b') AS starts_b,
        | contains(p_name, 'spark') AS has_spark,
        | printf('%s-%d', p_brand, p_size) AS brand_size
        |FROM part""".stripMargin,
    "q35_windowed_join" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |                  make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP))//300000)*300000000) AS wstart
        |           FROM events)
        |SELECT v.user_id, v.wstart, count(*) AS n_pairs
        |FROM (SELECT * FROM e WHERE event_type='view') v
        |JOIN (SELECT * FROM e WHERE event_type='click') c
        |  ON v.user_id = c.user_id AND v.wstart = c.wstart
        |GROUP BY v.user_id, v.wstart""".stripMargin,
    "q36_theta_join" ->
      """SELECT s_suppkey, count(*) AS n_richer
        |FROM supplier JOIN customer
        |  ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
        |GROUP BY s_suppkey""".stripMargin,
    "q37_explode_unnest" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT UNNEST(string_split(p_type, ' ')) AS word FROM part)
        |GROUP BY word""".stripMargin,
    "q38_first_last_value" ->
      """SELECT s_suppkey, s_nationkey,
        | first_value(s_suppkey) OVER w AS richest,
        | last_value(s_suppkey) OVER w AS poorest
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q39_listagg" ->
      """SELECT n_name,
        | string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
        | count(*) AS n_sup
        |FROM nation JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_name""".stripMargin,
    "q40_try_cast" ->
      """SELECT p_partkey,
        | TRY_CAST(substring(p_brand, 7, 2) AS INTEGER) AS brand_num,
        | TRY_CAST(p_name AS INTEGER) AS junk_null,
        | CAST(p_size AS VARCHAR) AS size_str,
        | CAST(floor(p_retailprice) AS INTEGER) AS price_int
        |FROM part""".stripMargin,
  )
}
