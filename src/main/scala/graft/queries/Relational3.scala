package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QueryDefs._

/** Third tranche of the relational surface: window FRAMES (ROWS + RANGE
  * with a value offset), ordered-set aggregates (percentile_disc),
  * regexp functions, array/list functions, bitwise ops + bit aggregates
  * (SURVEY.md §2.5 frames, §2.8 functions).
  */
object Relational3 {

  /** Window frames: a 30-day RANGE frame (value-based — peers by order
    * date distance, the frame Flink's RANGE OVER maps to) next to a
    * 3-row ROWS frame, per customer. Order keys use epoch days so the
    * range offset is numeric on both engines.
    */
  val q57_window_frames: Q = (s, d) => {
    import s.implicits._
    val day = (unix_millis($"o_orderdate".cast("timestamp")) / lit(86400000L)).cast("long")
    val base = Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", day.as("od"))
    val byDay = Window.partitionBy($"o_custkey").orderBy($"od")
    val w30 = byDay.rangeBetween(-30, 0)
    val w3r = Window.partitionBy($"o_custkey").orderBy($"od", $"o_orderkey")
      .rowsBetween(-2, 0)
    base.select(
      $"o_orderkey", $"o_custkey",
      round(sum($"o_totalprice").over(w30), 2).as("sum_30d"),
      count(lit(1)).over(w30).as("n_30d"),
      round(avg($"o_totalprice").over(w3r), 4).as("avg_3rows"))
  }

  /** Ordered-set aggregates: exact discontinuous percentiles
    * (percentile_disc WITHIN GROUP semantics) — the smallest value whose
    * cumulative row count reaches ceil(p·n) — per order status.
    *
    * Spark's `percentile_disc` is an ObjectAggregateFunction that buffers
    * every group value in one aggregation buffer (the q49 scale hazard:
    * 3 status groups would funnel a third of the table through each of 3
    * reducers). Same cure as q49: hash-aggregated value histogram + one
    * cumulative-count window over distinct values + a final hash
    * aggregate picks the rank-straddling value. PlanSpec locks the
    * ObjectAggregate out of the plan.
    */
  val q58_percentile_disc: Q = (s, d) => {
    import s.implicits._
    val hist = Tables.orders(s, d)
      .groupBy($"o_orderstatus", $"o_totalprice")
      .agg(count(lit(1)).as("cnt"))
    val grp = Window.partitionBy($"o_orderstatus")
    val withCum = hist
      .withColumn("cum", sum($"cnt").over(grp.orderBy($"o_totalprice")))
      .withColumn("n", sum($"cnt").over(grp))
    // percentile_disc(p) = value at 1-based rank ceil(p*n); this distinct
    // value covers ranks (cum-cnt, cum]
    def disc(p: Double): org.apache.spark.sql.Column = {
      val rank = ceil(lit(p) * $"n")
      sum(when($"cum" - $"cnt" < rank && rank <= $"cum", $"o_totalprice")
        .otherwise(lit(0.0)))
    }
    withCum.groupBy($"o_orderstatus")
      .agg(
        disc(0.5).as("p50_disc"),
        disc(0.9).as("p90_disc"),
        sum($"cnt").as("n"))
  }

  /** Regexp functions: extract / replace-all / count / match over part
    * names.
    */
  val q59_regexp: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
      regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
      regexp_count($"p_name", lit("a")).cast("long").as("n_a"),
      $"p_name".rlike("^[a-m]").as("starts_first_half"))
  }

  /** Array/list functions over tokenized part names: size, contains,
    * sort, slice, join, distinct.
    */
  val q60_array_funcs: Q = (s, d) => {
    import s.implicits._
    val words = split($"p_name", " ")
    Tables.part(s, d).select(
      $"p_partkey",
      size(words).cast("long").as("n_words"),
      array_contains(words, "spark").as("has_spark"),
      array_join(sort_array(words), "|").as("sorted_joined"),
      array_join(slice(words, 1, 2), "|").as("first_two"),
      size(array_distinct(words)).cast("long").as("n_distinct"),
      element_at(words, -1).as("last_word"))
  }

  /** Bitwise scalar ops + bit aggregates per brand. */
  val q61_bit_ops: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_brand", $"p_size",
        ($"p_size".bitwiseAND(lit(12))).as("band"),
        ($"p_size".bitwiseOR(lit(3))).as("bor"),
        ($"p_size".bitwiseXOR(lit(255))).as("bxor"),
        shiftleft($"p_size", 2).as("shl"))
      .groupBy($"p_brand")
      .agg(
        bit_and($"p_size").as("agg_and"),
        bit_or($"p_size").as("agg_or"),
        bit_xor($"p_size").as("agg_xor"),
        sum($"band").cast("long").as("sum_band"),
        sum($"bor").cast("long").as("sum_bor"),
        sum($"bxor").cast("long").as("sum_bxor"),
        sum($"shl").cast("long").as("sum_shl"))
  }

  /** Gap sessions via Spark's NATIVE session_window function (the
    * SESSION TVF analog) — complements q25's manual lag/running-sum
    * formulation with the built-in operator; same 30-minute gap, same
    * oracle shape. window.start = first event, window.end = last + gap.
    */
  val q62_session_window_fn: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_millis($"w.start").as("s_start_ms"),
        unix_millis($"w.end").as("s_end_ms"),
        $"n_events")
  }

  /** DYNAMIC session gaps ([U] flink-streaming-java `SessionWindowTimeGapExtractor`
    * / `EventTimeSessionWindows.withDynamicGap`): the per-event gap is an
    * expression — clicks close a session after 5 minutes of quiet, other
    * events after 30. Spark's `session_window(ts, gapColumn)` is the
    * native equivalent (per-event window [ts, ts+gap], overlapping-or-
    * touching windows merge). The oracle is the q25/q62 cumulative
    * technique generalized: a session breaks when the event's time
    * exceeds the running max of (prior ts + prior gap) — the running max
    * equals the current session's horizon by induction, since a session
    * opener strictly exceeds everything before it.
    */
  val q122_dynamic_session_gap: Q = (s, d) => {
    import s.implicits._
    val gap = when($"event_type" === "click", lit("5 minutes"))
      .otherwise(lit("30 minutes"))
    Tables.events(s, d)
      .groupBy($"user_id", session_window($"ts", gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_millis($"w.start").as("s_start_ms"),
        unix_millis($"w.end").as("s_end_ms"),
        $"n_events")
  }

  /** posexplode / UNNEST WITH ORDINALITY: token positions survive the
    * flatten (Flink's UNNEST WITH ORDINALITY; SURVEY.md §2.9).
    */
  val q63_posexplode: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
      .select($"p_partkey", ($"pos" + 1).cast("long").as("ordinality"), $"word")
  }

  /** Bag-semantics set ops: UNION ALL / INTERSECT ALL / EXCEPT ALL over
    * customer vs supplier nation keys (the multiset variants beyond q11's
    * distinct set ops).
    */
  val q64_set_ops_all: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".as("k")).filter($"k" < 13)
    val sup = Tables.supplier(s, d).select($"s_nationkey".as("k")).filter($"k" >= 7)
    val u = c.unionAll(sup).groupBy($"k").agg(count(lit(1)).as("n")).withColumn("op", lit("union_all"))
    val i = c.intersectAll(sup).groupBy($"k").agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val e = c.exceptAll(sup).groupBy($"k").agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    u.unionAll(i).unionAll(e).select($"op", $"k", $"n")
  }

  /** Map functions (SURVEY.md §2.8 "collection functions"): construct,
    * probe, enumerate, and parse maps. The oracle reconstructs the same
    * scalar RESULTS without a map type (DuckDB's MAP doesn't round-trip
    * the driver's parquet compare), so the map semantics are what's
    * verified.
    */
  val q65_map_funcs: Q = (s, d) => {
    import s.implicits._
    val m = map(
      lit("brand"), $"p_brand",
      lit("type"), $"p_type",
      lit("size"), $"p_size".cast("string"))
    val parsed = str_to_map(concat(lit("a:"), $"p_size".cast("string"), lit(",b:1")), lit(","), lit(":"))
    Tables.part(s, d).select(
      $"p_partkey",
      element_at(m, "brand").as("brand_v"),
      size(m).cast("long").as("n_entries"),
      array_join(map_keys(m), ",").as("keys"),
      array_join(map_values(m), "|").as("vals"),
      map_contains_key(m, "type").as("has_type"),
      element_at(parsed, "a").as("a_val"))
  }

  /** TPC-H Q5 shape: 6-way join (customer ⋈ orders ⋈ lineitem ⋈ supplier
    * ⋈ nation ⋈ region) with local-supplier predicate and a year of
    * orders — the multi-join planning gauntlet: Catalyst must broadcast
    * nation/region, pick hash joins for the fact chain, and push the
    * region/date filters to the scans.
    */
  val q66_local_supplier_volume: Q = (s, d) => {
    import s.implicits._
    val customer = Tables.customer(s, d)
    val orders = Tables.orders(s, d)
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
    val lineitem = Tables.lineitem(s, d)
    val supplier = Tables.supplier(s, d)
    val nation = Tables.nation(s, d)
    val region = Tables.region(s, d).filter($"r_name" === "ASIA")
    customer
      .join(orders, $"c_custkey" === $"o_custkey")
      .join(lineitem, $"l_orderkey" === $"o_orderkey")
      .join(supplier, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(nation, $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Approximate aggregates (Flink's APPROX_COUNT_DISTINCT; Spark's HLL++
    * and approx quantile sketches), oracled on their ERROR CONTRACT (the
    * q148 pattern — sketch outputs are engine-specific, the tolerance is
    * not): per status the query runs the sketches AND their exact
    * counterparts, emits the exact values plus the ≤5%/≤2%
    * relative-error booleans, and DuckDB recomputes the exact side from
    * scratch and pins the booleans TRUE. The PRODUCTION path is the
    * sketch-only aggregate — ONE pass with mergeable partials, no
    * Expand double-scan (the 100 TB shape; ApproxSpec locks the same
    * tolerances on it in isolation); the exact second scan here is the
    * correctness harness, deliberately kept out of the hot shape.
    */
  val q67_approx_aggs: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val approx = o.groupBy($"o_orderstatus")
      .agg(
        approx_count_distinct($"o_custkey", 0.02).as("ac"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap"),
        count(lit(1)).as("n"))
    val exact = o.groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("exact_custs"),
        expr("percentile(o_totalprice, 0.5)").as("ep"))
    approx.join(exact, "o_orderstatus")
      .select($"o_orderstatus", $"n", $"exact_custs",
        round($"ep", 4).as("exact_p50"),
        (abs($"ac" - $"exact_custs") / $"exact_custs" <= 0.05).as("cd_ok"),
        (abs($"ap" - $"ep") / $"ep" <= 0.02).as("p50_ok"))
  }

  /** Calendar functions: add_months / last_day / quarter / weekofyear /
    * dayofyear / date_trunc — the month-calendar arithmetic family beyond
    * q14/q53's interval math.
    */
  val q68_calendar: Q = (s, d) => {
    import s.implicits._
    val od = $"o_orderdate".cast("timestamp")
    Tables.orders(s, d).select(
      $"o_orderkey",
      add_months(od, 3).cast("date").as("plus_3m"),
      last_day(od).as("month_end"),
      quarter(od).cast("long").as("qtr"),
      weekofyear(od).cast("long").as("iso_week"),
      dayofyear(od).cast("long").as("doy"),
      date_trunc("quarter", od).cast("date").as("qtr_start"))
  }

  /** String shaping family: pad / trim variants / repeat / translate /
    * reverse / space collapsing (SURVEY.md §2.8, beyond q13/q44).
    */
  val q69_string_shape: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      lpad($"p_brand", 12, "*").as("padded_l"),
      rpad($"p_brand", 12, ".").as("padded_r"),
      ltrim(rtrim(concat(lit("  "), $"p_name", lit("  ")))).as("trimmed"),
      repeat(lit("ab"), $"p_size" % 4).as("repeated"),
      translate($"p_name", "aeiou", "AEIOU").as("upvoweled"),
      reverse($"p_brand").as("reversed"),
      regexp_replace($"p_name", " +", " ").as("collapsed"))
  }

  /** Null-handling + comparison scalars: nullif / coalesce chains /
    * greatest / least / nvl2-shape (SURVEY.md §2.8 conditional family
    * beyond q15's CASE buckets).
    */
  val q70_null_funcs: Q = (s, d) => {
    import s.implicits._
    val maybe = nullif($"o_orderpriority", lit("1-URGENT"))
    Tables.orders(s, d).select(
      $"o_orderkey",
      maybe.as("prio_or_null"),
      coalesce(maybe, lit("(urgent)")).as("prio_filled"),
      when(maybe.isNotNull, lit("kept")).otherwise(lit("nulled")).as("nvl2_shape"),
      greatest($"o_totalprice", lit(150000.0)).as("floor_150k"),
      least($"o_custkey" % 10, lit(5L)).as("cust_mod_min"),
      isnull(maybe).as("was_urgent"))
  }

  /** Shared-ANSI-text query runner (same string on both engines). */
  private def sharedSql(tables: Seq[String], text: String): Q = (s, d) => {
    tables.foreach(t => graft.Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(text)
  }

  /** Correlated LATERAL join (Flink's correlated table function / SQL
    * LATERAL): per nation, the top-2 customers by account balance —
    * identical SQL text runs on both engines.
    */
  val lateralText: String =
    """SELECT n_name, t.c_custkey, t.c_acctbal
      |FROM nation,
      |LATERAL (SELECT c_custkey, c_acctbal FROM customer
      |         WHERE c_nationkey = n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS t""".stripMargin

  /** EXISTS / NOT EXISTS correlated subqueries (SQL surface of semi/anti
    * joins, beyond q05/q06's DataFrame formulation) — shared text.
    */
  val existsText: String =
    """SELECT s_suppkey, s_nationkey,
      | EXISTS (SELECT 1 FROM customer
      |         WHERE c_nationkey = s_nationkey AND c_acctbal > 9000) AS rich_neighbor
      |FROM supplier
      |WHERE EXISTS (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
      |  AND NOT EXISTS (SELECT 1 FROM customer
      |                  WHERE c_nationkey = s_nationkey AND c_acctbal < -900)""".stripMargin

  /** Protobuf wire-format round trip (SURVEY.md §2.1 "formats: protobuf",
    * [U] flink-formats/flink-protobuf): lineitem columns encode to proto3
    * wire bytes and decode back via graft.sources.ProtobufFormat (the
    * from-scratch public-spec codec), then aggregate over the DECODED
    * frame — the DuckDB oracle computes the same aggregate on the raw
    * table, so any wire-level corruption fails the hash. Quantities are
    * integral doubles (exact under summation); integer sums are cast to
    * BIGINT on both engines (DuckDB HUGEINT gotcha).
    */
  val q74_protobuf_roundtrip: Q = (s, d) => {
    import s.implicits._
    import graft.sources.ProtobufFormat
    import graft.sources.ProtobufFormat._
    val msg = PbMessage(Seq(
      PbField(1, "l_orderkey", PInt64), PbField(2, "l_linenumber", PInt32),
      PbField(3, "l_quantity", PDouble), PbField(4, "l_returnflag", PString),
      PbField(5, "l_linestatus", PString)))
    val src = Tables.lineitem(s, d).select(
      $"l_orderkey".cast("long").as("l_orderkey"),
      $"l_linenumber".cast("int").as("l_linenumber"),
      $"l_quantity".cast("double").as("l_quantity"),
      $"l_returnflag", $"l_linestatus")
    ProtobufFormat.roundTrip(src, msg)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"l_quantity"), 2).as("sum_qty"),
        sum($"l_linenumber").cast("long").as("sum_line"),
        max($"l_orderkey").as("max_ok"))
  }

  /** Debezium CDC decode, oracled end-to-end (SURVEY.md §2.1 "CDC
    * formats", [U] flink-formats/flink-json debezium): orders rows
    * ENCODE into debezium-json envelopes (op by key residue — u / c /
    * d / snapshot-READ r) and decode through
    * [[graft.operators.Changelog.fromDebeziumJson]] into the row_kind
    * changelog; the DuckDB oracle states the expected expansion
    * directly in SQL (u → -U before + +U after, c/r → +I, d → -D), so
    * the JSON envelope build AND the decoder are both hash-gated.
    */
  val q143_cdc_decode: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d).select($"o_orderkey", $"o_totalprice",
      pmod($"o_orderkey", lit(4)).as("r"))
    val op = when($"r" === 0, "u").when($"r" === 1, "c")
      .when($"r" === 2, "d").otherwise("r")
    val before = struct($"o_orderkey", ($"o_totalprice" - 1).as("o_totalprice"))
    val after = struct($"o_orderkey", $"o_totalprice")
    val js = o.select(to_json(struct(
      when(op.isin("u", "d"), before).as("before"),
      when(op =!= "d", after).as("after"),
      op.as("op"))).as("json"))
    graft.operators.Changelog.fromDebeziumJson(js, "json",
      "o_orderkey BIGINT, o_totalprice DOUBLE")
  }

  /** Canal / maxwell / ogg CDC decode, oracled end-to-end (SURVEY.md
    * §2.1 "CDC formats", [U] flink-formats/flink-json canal/maxwell +
    * flink-connectors ogg): the q143 construction for the OTHER three
    * decoders — orders rows encode into each format's envelope (op by
    * key residue: 0 update, 1 insert, 2 delete; canal/maxwell carry a
    * partial `old` with only the changed column, exercising the
    * key-presence overlay; ogg carries full before images) and decode
    * through [[graft.operators.Changelog]]; the DuckDB oracle states
    * each format's expected expansion directly in SQL.
    */
  val q147_cdc_formats: Q = (s, d) => {
    import s.implicits._
    import graft.operators.Changelog
    val o = Tables.orders(s, d).select($"o_orderkey", $"o_totalprice",
      pmod($"o_orderkey", lit(3)).as("r"))
    val after = struct($"o_orderkey", $"o_totalprice")
    val oldOne = struct(($"o_totalprice" - 1).as("o_totalprice"))
    val canal = o.select(to_json(struct(
      array(after).as("data"),
      when($"r" === 0, array(oldOne)).as("old"),
      when($"r" === 0, "UPDATE").when($"r" === 1, "INSERT")
        .otherwise("DELETE").as("type"))).as("json"))
    val maxwell = o.select(to_json(struct(
      after.as("data"),
      when($"r" === 0, oldOne).as("old"),
      when($"r" === 0, "update").when($"r" === 1, "insert")
        .otherwise("delete").as("type"))).as("json"))
    val ogg = o.select(to_json(struct(
      when($"r".isin(0, 2),
        struct($"o_orderkey", ($"o_totalprice" - 1).as("o_totalprice"))).as("before"),
      when($"r" =!= 2, after).as("after"),
      when($"r" === 0, "U").when($"r" === 1, "I").otherwise("D")
        .as("op_type"))).as("json"))
    val sch = "o_orderkey BIGINT, o_totalprice DOUBLE"
    Changelog.fromCanalJson(canal, "json", sch).withColumn("fmt", lit("canal"))
      .unionByName(Changelog.fromMaxwellJson(maxwell, "json", sch)
        .withColumn("fmt", lit("maxwell")))
      .unionByName(Changelog.fromOggJson(ogg, "json", sch)
        .withColumn("fmt", lit("ogg")))
  }

  /** Avro binary round trip (SURVEY.md §2.1 "formats: avro",
    * [U] flink-formats/flink-avro): orders columns encode to Avro
    * binary records and decode back via the from-scratch
    * [[graft.sources.AvroFormat]] codec; the oracle is the identity
    * SELECT, so any wire-level corruption fails the hash.
    */
  val q144_avro_roundtrip: Q = (s, d) => {
    import graft.sources.AvroFormat
    val src = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val schemaJson = AvroFormat.avroJson(src.schema)
    AvroFormat.decodeAvro(
      AvroFormat.encodeAvro(src, schemaJson).select("avro"), "avro", schemaJson)
  }

  /** LIMIT/OFFSET pagination (SURVEY.md §2.6 "sort/limit"; [U]
    * flink-table-planner SqlToRelConverter fetch/offset → SortLimit):
    * identical SQL text runs on both engines. Spark plans the
    * offset+fetch as a single TakeOrderedAndProject-style global top-60
    * then drops 40 — no full sort of the 1.5M-row input at scale.
    */
  private val paginationText =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 40""".stripMargin

  /** Flink-named scalar functions (SURVEY.md §2.8; [U] flink-table-planner
    * BuiltInFunctionDefinitions): SPLIT_INDEX / JSON_VALUE / JSON_EXISTS /
    * FROM_BASE64 / TO_BASE64 / TRUNCATE / TO_TIMESTAMP_LTZ registered by
    * `graft.functions.FlinkFunctions` so this Flink SQL text runs as-is —
    * each composed from Spark's codegen'd built-in expressions, oracled
    * with DuckDB's native equivalents.
    */
  val q80_flink_funcs: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d).createOrReplaceTempView("q80_events")
    s.sql(
      """SELECT event_id,
        |  json_value(props, '$.k') AS k_str,
        |  json_exists(props, '$.k') AS has_k,
        |  json_exists(props, '$.missing') AS has_missing,
        |  split_index(event_type, 'e', 1) AS seg1,
        |  split_index(event_type, 'e', -1) AS seg_neg,
        |  from_base64(to_base64(event_type)) AS b64_roundtrip,
        |  CAST(truncate(value, 1) AS DOUBLE) AS trunc_pos,
        |  CAST(truncate(0.0 - value, 1) AS DOUBLE) AS trunc_neg,
        |  CAST(unix_millis(to_timestamp_ltz(unix_millis(ts), 3)) AS BIGINT) AS ts_ms,
        |  CAST(unix_seconds(to_timestamp_ltz(unix_seconds(ts), 0)) AS BIGINT) AS ts_s
        |FROM q80_events""".stripMargin)
  }

  /** The round-6 Flink scalar additions driven as SQL TEXT through the
    * dialect chain — IS_JSON / JSON_STRING / JSON_ARRAY / ELEMENT plus
    * the ARRAY[...] / MAP[...] bracket constructors
    * ([[graft.plans.BracketConstructors]]) — DuckDB-oracled via its
    * native json_valid/to_json/list functions.
    */
  val q99_flink_funcs2: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q99_events")
    graft.FlinkSql.sql(s,
      """SELECT event_id,
        |  is_json(props) AS props_is_json,
        |  json_string(event_type) AS type_json,
        |  json_array(event_id, user_id) AS ids_json,
        |  element(ARRAY[event_id]) AS elem,
        |  MAP['len', char_length(props)]['len'] AS props_len
        |FROM q99_events""".stripMargin)
  }

  /** Flink's UNNEST join SQL ([U] flink-table-planner SqlUnnestOperator,
    * runtime UnnestRowsFunction; SURVEY.md §2.9): `CROSS JOIN
    * UNNEST(array) AS t (c)` rewritten onto a LATERAL VIEW explode
    * correlate by `graft.plans.UnnestRewrite` (the injected parser and
    * `graft.FlinkSql` route the same text). Tags are split out of
    * event_type and aggregated; oracled by DuckDB's native UNNEST.
    */
  val q86_unnest_sql: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q86_events")
    s.sql(graft.plans.UnnestRewrite.rewrite(
      """SELECT t.tag, count(*) AS n, round(sum(e.value), 2) AS sum_value
        |FROM q86_events AS e
        |CROSS JOIN UNNEST(split(e.event_type, 'i')) AS t (tag)
        |GROUP BY t.tag""".stripMargin))
  }

  /** Hash + timezone function family (SURVEY.md §2.8; [U]
    * BuiltInFunctionDefinitions SHA256 / CONVERT_TZ): the Flink-named
    * functions registered by `graft.functions.FlinkFunctions` — SHA256
    * digests and CONVERT_TZ wall-clock rebases (DST-sensitive: New York
    * offset differs between the January fixture dates and July) —
    * oracled with DuckDB's sha256 and AT TIME ZONE chain. SHA224/384/512
    * have no DuckDB native and stay FIPS-vector-pinned in
    * FlinkFunctionsSpec.
    */
  val q88_hash_tz: Q = (s, d) => {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d).createOrReplaceTempView("q88_events")
    s.sql(
      """SELECT event_id,
        |  sha256(event_type) AS h256,
        |  md5(event_type) AS h_md5,
        |  convert_tz(date_trunc('second', ts), 'UTC', 'Asia/Shanghai') AS ts_cn,
        |  convert_tz(date_trunc('second', ts), 'UTC', 'America/New_York') AS ts_ny
        |FROM q88_events""".stripMargin)
  }

  /** Retract-stream snapshot diff ([U] flink-table-api
    * `toChangelogStream` / RowKind): two deterministic snapshots of a
    * per-customer order count — an earlier cutoff over all priorities vs
    * a later cutoff restricted to urgent/high — diffed into the
    * +I/-U/+U/-D changelog by [[graft.streaming.ChangelogStream
    * .snapshotDiff]] (the batch kernel the streaming foreachBatch wrapper
    * runs per micro-batch). All four row kinds occur; the DuckDB oracle
    * replays the same FULL OUTER JOIN algebra in SQL.
    */
  val q121_changelog_diff: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val prev = orders.filter(col("o_orderdate") < lit("1998-01-01"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val cur = orders.filter(col("o_orderdate") < lit("1999-01-01") &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    graft.streaming.ChangelogStream.snapshotDiff(prev, cur, Seq("o_custkey"))
  }

  /** User-defined TABLE aggregate ([U] flink-table-common
    * TableAggregateFunction.java; the documentation's canonical Top2):
    * per event_type, `flatAggregate` of the Top2 function emits the two
    * best (event_id, value) pairs with ranks — an aggregate returning
    * MULTIPLE rows per group, the API shape Spark's Aggregator cannot
    * express. One shuffle on the group key, O(1) accumulator per group
    * (see [[graft.operators.TableAgg]]); the DuckDB oracle is the
    * equivalent row_number()-over rewrite.
    */
  val q132_table_agg_top2: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("event_id").cast("long").as("event_id"),
        col("value"))
      .as[(String, Long, Double)]
    graft.operators.TableAgg
      .flatAggregate(ev, (t: (String, Long, Double)) => t._1,
        new graft.operators.Top2().contramap[(String, Long, Double)](t => (t._2, t._3)))
      .map { case (et, (id, v, r)) => (et, id, v, r) }
      .toDF("event_type", "event_id", "value", "rnk")
      .withColumn("value", round(col("value"), 2))
  }

  val queries: Map[String, Q] = Map(
    "q132_table_agg_top2" -> q132_table_agg_top2,
    "q121_changelog_diff" -> q121_changelog_diff,
    "q88_hash_tz" -> q88_hash_tz,
    "q86_unnest_sql" -> q86_unnest_sql,
    "q80_flink_funcs" -> q80_flink_funcs,
    "q99_flink_funcs2" -> q99_flink_funcs2,
    "q74_protobuf_roundtrip" -> q74_protobuf_roundtrip,
    "q143_cdc_decode" -> q143_cdc_decode,
    "q144_avro_roundtrip" -> q144_avro_roundtrip,
    "q146_pagination" -> sharedSql(Seq("orders"), paginationText),
    "q147_cdc_formats" -> q147_cdc_formats,
    "q71_lateral" -> sharedSql(Seq("nation", "customer"), lateralText),
    "q72_exists" -> sharedSql(Seq("supplier", "customer", "nation"), existsText),
    "q70_null_funcs" -> q70_null_funcs,
    "q69_string_shape" -> q69_string_shape,
    "q68_calendar" -> q68_calendar,
    "q67_approx_aggs" -> q67_approx_aggs,
    "q66_local_supplier_volume" -> q66_local_supplier_volume,
    "q65_map_funcs" -> q65_map_funcs,
    "q63_posexplode" -> q63_posexplode,
    "q64_set_ops_all" -> q64_set_ops_all,
    "q62_session_window_fn" -> q62_session_window_fn,
    "q122_dynamic_session_gap" -> q122_dynamic_session_gap,
    "q57_window_frames" -> q57_window_frames,
    "q58_percentile_disc" -> q58_percentile_disc,
    "q59_regexp" -> q59_regexp,
    "q60_array_funcs" -> q60_array_funcs,
    "q61_bit_ops" -> q61_bit_ops,
  )

  val oracle: Map[String, String] = Map(
    // q67 contract oracle: DuckDB recomputes the EXACT side (distinct
    // customers, interpolated median) from scratch and pins the sketch
    // error booleans TRUE; the sketches themselves are engine-specific
    "q67_approx_aggs" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       count(DISTINCT o_custkey) AS exact_custs,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
        |       TRUE AS cd_ok, TRUE AS p50_ok
        |FROM orders GROUP BY 1""".stripMargin,
    "q132_table_agg_top2" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |                  row_number() OVER (PARTITION BY event_type
        |                                     ORDER BY value DESC, event_id) AS rnk
        |           FROM events)
        |SELECT event_type, event_id, round(value, 2) AS value,
        |       CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 2""".stripMargin,
    "q121_changelog_diff" ->
      """WITH prev AS (SELECT o_custkey, count(*) AS n FROM orders
        |              WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
        |cur AS (SELECT o_custkey, count(*) AS n FROM orders
        |        WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |          AND o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1),
        |j AS (SELECT p.o_custkey AS pk, p.n AS pn, c.o_custkey AS ck, c.n AS cn
        |      FROM prev p FULL OUTER JOIN cur c ON p.o_custkey = c.o_custkey)
        |SELECT '+I' AS row_kind, 0 AS row_seq, ck AS o_custkey, cn AS n
        |FROM j WHERE pk IS NULL
        |UNION ALL
        |SELECT '-D', 0, pk, pn FROM j WHERE ck IS NULL
        |UNION ALL
        |SELECT '-U', 0, pk, pn FROM j WHERE pk IS NOT NULL AND ck IS NOT NULL AND pn <> cn
        |UNION ALL
        |SELECT '+U', 1, ck, cn FROM j WHERE pk IS NOT NULL AND ck IS NOT NULL AND pn <> cn""".stripMargin,
    "q88_hash_tz" ->
      """SELECT event_id,
        |  sha256(event_type) AS h256,
        |  md5(event_type) AS h_md5,
        |  strftime(date_trunc('second', CAST(ts AS TIMESTAMP))
        |           AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Shanghai',
        |           '%Y-%m-%d %H:%M:%S') AS ts_cn,
        |  strftime(date_trunc('second', CAST(ts AS TIMESTAMP))
        |           AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York',
        |           '%Y-%m-%d %H:%M:%S') AS ts_ny
        |FROM events""".stripMargin,
    "q86_unnest_sql" ->
      """WITH x AS (SELECT value, unnest(string_split(event_type, 'i')) AS tag
        |           FROM events)
        |SELECT tag, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY tag""".stripMargin,
    "q99_flink_funcs2" ->
      """SELECT event_id,
        |  json_valid(props) AS props_is_json,
        |  CAST(to_json(event_type) AS VARCHAR) AS type_json,
        |  CAST(to_json([event_id, user_id]) AS VARCHAR) AS ids_json,
        |  [event_id][1] AS elem,
        |  CAST(length(props) AS INTEGER) AS props_len
        |FROM events""".stripMargin,
    "q80_flink_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  (json_extract(props, '$.k') IS NOT NULL) AS has_k,
        |  (json_extract(props, '$.missing') IS NOT NULL) AS has_missing,
        |  list_extract(string_split(event_type, 'e'), 2) AS seg1,
        |  CAST(NULL AS VARCHAR) AS seg_neg,
        |  decode(from_base64(base64(encode(event_type)))) AS b64_roundtrip,
        |  CAST(floor(CAST(value AS DECIMAL(18,9)) * 10) / 10 AS DOUBLE) AS trunc_pos,
        |  CAST(ceil(CAST(0.0 - value AS DECIMAL(18,9)) * 10) / 10 AS DOUBLE) AS trunc_neg,
        |  CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_ms,
        |  CAST(epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 AS BIGINT) AS ts_s
        |FROM events""".stripMargin,
    "q74_protobuf_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        | count(*) AS n,
        | round(sum(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty,
        | CAST(sum(l_linenumber) AS BIGINT) AS sum_line,
        | CAST(max(l_orderkey) AS BIGINT) AS max_ok
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q143_cdc_decode" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderkey % 4 AS r FROM orders),
        |ex AS (
        |  SELECT '-U' AS row_kind, o_orderkey, o_totalprice - 1 AS o_totalprice
        |  FROM o WHERE r = 0
        |  UNION ALL SELECT '+U', o_orderkey, o_totalprice FROM o WHERE r = 0
        |  UNION ALL SELECT '+I', o_orderkey, o_totalprice FROM o WHERE r = 1
        |  UNION ALL SELECT '-D', o_orderkey, o_totalprice - 1 FROM o WHERE r = 2
        |  UNION ALL SELECT '+I', o_orderkey, o_totalprice FROM o WHERE r = 3
        |) SELECT row_kind, o_orderkey, o_totalprice FROM ex""".stripMargin,
    "q144_avro_roundtrip" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "q146_pagination" -> paginationText,
    "q147_cdc_formats" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderkey % 3 AS r FROM orders),
        |cm AS (
        |  SELECT '-U' AS row_kind, o_orderkey, o_totalprice - 1 AS o_totalprice
        |  FROM o WHERE r = 0
        |  UNION ALL SELECT '+U', o_orderkey, o_totalprice FROM o WHERE r = 0
        |  UNION ALL SELECT '+I', o_orderkey, o_totalprice FROM o WHERE r = 1
        |  UNION ALL SELECT '-D', o_orderkey, o_totalprice FROM o WHERE r = 2),
        |ogg AS (
        |  SELECT '-U' AS row_kind, o_orderkey, o_totalprice - 1 AS o_totalprice
        |  FROM o WHERE r = 0
        |  UNION ALL SELECT '+U', o_orderkey, o_totalprice FROM o WHERE r = 0
        |  UNION ALL SELECT '+I', o_orderkey, o_totalprice FROM o WHERE r = 1
        |  UNION ALL SELECT '-D', o_orderkey, o_totalprice - 1 FROM o WHERE r = 2)
        |SELECT row_kind, o_orderkey, o_totalprice, 'canal' AS fmt FROM cm
        |UNION ALL SELECT row_kind, o_orderkey, o_totalprice, 'maxwell' FROM cm
        |UNION ALL SELECT row_kind, o_orderkey, o_totalprice, 'ogg' FROM ogg""".stripMargin,
    "q71_lateral" -> lateralText,
    "q72_exists" -> existsText,
    "q70_null_funcs" ->
      """SELECT o_orderkey,
        | nullif(o_orderpriority, '1-URGENT') AS prio_or_null,
        | coalesce(nullif(o_orderpriority, '1-URGENT'), '(urgent)') AS prio_filled,
        | CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NOT NULL
        |      THEN 'kept' ELSE 'nulled' END AS nvl2_shape,
        | greatest(o_totalprice, 150000.0) AS floor_150k,
        | least(o_custkey % 10, 5) AS cust_mod_min,
        | nullif(o_orderpriority, '1-URGENT') IS NULL AS was_urgent
        |FROM orders""".stripMargin,
    "q69_string_shape" ->
      """SELECT p_partkey,
        | lpad(p_brand, 12, '*') AS padded_l,
        | rpad(p_brand, 12, '.') AS padded_r,
        | ltrim(rtrim('  ' || p_name || '  ')) AS trimmed,
        | repeat('ab', p_size % 4) AS repeated,
        | translate(p_name, 'aeiou', 'AEIOU') AS upvoweled,
        | reverse(p_brand) AS reversed,
        | regexp_replace(p_name, ' +', ' ', 'g') AS collapsed
        |FROM part""".stripMargin,
    "q68_calendar" ->
      """SELECT o_orderkey,
        | CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        | CAST(last_day(o_orderdate) AS DATE) AS month_end,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        | CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start
        |FROM orders""".stripMargin,
    "q66_local_supplier_volume" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        | count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q65_map_funcs" ->
      """SELECT p_partkey,
        | p_brand AS brand_v,
        | CAST(3 AS BIGINT) AS n_entries,
        | 'brand,type,size' AS keys,
        | p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR) AS vals,
        | true AS has_type,
        | CAST(p_size AS VARCHAR) AS a_val
        |FROM part""".stripMargin,
    "q63_posexplode" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
        |SELECT p_partkey,
        |       CAST(UNNEST(range(1, len(words) + 1)) AS BIGINT) AS ordinality,
        |       UNNEST(words) AS word
        |FROM w""".stripMargin,
    "q64_set_ops_all" ->
      """WITH c AS (SELECT c_nationkey AS k FROM customer WHERE c_nationkey < 13),
        |s AS (SELECT s_nationkey AS k FROM supplier WHERE s_nationkey >= 7),
        |u AS (SELECT 'union_all' AS op, k, count(*) AS n
        |      FROM (SELECT k FROM c UNION ALL SELECT k FROM s) GROUP BY k),
        |i AS (SELECT 'intersect_all' AS op, k, count(*) AS n
        |      FROM (SELECT k FROM c INTERSECT ALL SELECT k FROM s) GROUP BY k),
        |e AS (SELECT 'except_all' AS op, k, count(*) AS n
        |      FROM (SELECT k FROM c EXCEPT ALL SELECT k FROM s) GROUP BY k)
        |SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e""".stripMargin,
    "q122_dynamic_session_gap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS em,
        |                  CASE WHEN event_type = 'click' THEN 300000 ELSE 1800000 END AS gap_ms
        |           FROM events),
        |o AS (SELECT user_id, em, gap_ms,
        |             max(em + gap_ms) OVER (PARTITION BY user_id ORDER BY em, event_id
        |                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS horizon
        |      FROM e),
        |s AS (SELECT user_id, em, gap_ms,
        |             CASE WHEN horizon IS NULL OR em > horizon THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |t AS (SELECT user_id, em, gap_ms,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY em
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s)
        |SELECT user_id, min(em) AS s_start_ms, max(em + gap_ms) AS s_end_ms,
        |       count(*) AS n_events
        |FROM t GROUP BY user_id, sid""".stripMargin,
    "q62_session_window_fn" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (SELECT user_id, ts,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |      FROM e),
        |s AS (SELECT user_id, ts,
        |             CASE WHEN pts IS NULL OR epoch_ms(ts) - epoch_ms(pts) > 1800000
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |t AS (SELECT user_id, ts,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s)
        |SELECT user_id, epoch_ms(min(ts)) AS s_start_ms,
        |       epoch_ms(max(ts)) + 1800000 AS s_end_ms,
        |       count(*) AS n_events
        |FROM t GROUP BY user_id, sid""".stripMargin,
    "q57_window_frames" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |                  epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS od
        |           FROM orders)
        |SELECT o_orderkey, o_custkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY od
        |       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS sum_30d,
        | count(*) OVER (PARTITION BY o_custkey ORDER BY od
        |       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d,
        | round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
        |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg_3rows
        |FROM o""".stripMargin,
    "q58_percentile_disc" ->
      """SELECT o_orderstatus,
        | quantile_disc(o_totalprice, 0.5) AS p50_disc,
        | quantile_disc(o_totalprice, 0.9) AS p90_disc,
        | count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q59_regexp" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
        | regexp_matches(p_name, '^[a-m]') AS starts_first_half
        |FROM part""".stripMargin,
    "q60_array_funcs" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
        |SELECT p_partkey,
        | CAST(len(words) AS BIGINT) AS n_words,
        | list_contains(words, 'spark') AS has_spark,
        | list_aggregate(list_sort(words), 'string_agg', '|') AS sorted_joined,
        | list_aggregate(words[1:2], 'string_agg', '|') AS first_two,
        | CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
        | words[-1] AS last_word
        |FROM w""".stripMargin,
    "q61_bit_ops" ->
      """WITH b AS (SELECT p_brand, p_size,
        |                  p_size & 12 AS band, p_size | 3 AS bor,
        |                  xor(p_size, 255) AS bxor, p_size << 2 AS shl
        |           FROM part)
        |SELECT p_brand,
        | bit_and(p_size) AS agg_and, bit_or(p_size) AS agg_or,
        | bit_xor(p_size) AS agg_xor,
        | CAST(sum(band) AS BIGINT) AS sum_band, CAST(sum(bor) AS BIGINT) AS sum_bor,
        | CAST(sum(bxor) AS BIGINT) AS sum_bxor, CAST(sum(shl) AS BIGINT) AS sum_shl
        |FROM b GROUP BY p_brand""".stripMargin,
  )
}
