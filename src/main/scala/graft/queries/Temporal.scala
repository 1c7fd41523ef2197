package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{AsOfJoin, Cumulate}
import graft.streaming.WindowOps
import QueryDefs._

/** Event-time operators over the `events` table, run here in batch mode.
  * The same plan definitions run under Structured Streaming (Flink's
  * batch/stream-unified RuntimeExecutionMode, SURVEY.md §2.10): WindowOps
  * builders are shared between these batch queries and the streaming specs.
  *
  * Reference anchors: tumbling windows ([U] flink-streaming-java
  * TumblingEventTimeWindows.java / TUMBLE TVF), interval join
  * ([U] RowTimeIntervalJoin.java), temporal as-of join
  * ([U] TemporalRowTimeJoinOperator.java), session windows
  * ([U] EventTimeSessionWindows.java), CUMULATE TVF (SURVEY.md §2.5).
  */
object Temporal {

  /** TUMBLE(5 min) count+sum per event_type — shared builder with the
    * streaming path (WindowOps.tumbleAgg).
    */
  val q22_tumble_window: Q = (s, d) => {
    WindowOps.tumbleAgg(Tables.events(s, d), "5 minutes")
  }

  /** Interval join: view→click pairs per user within [0, 5 min] — the SQL
    * `b.ts BETWEEN a.ts AND a.ts + INTERVAL '5' MINUTE` shape. In batch
    * this is a range-predicate equi join (hash join on user_id, range as
    * residual); in streaming the identical predicate becomes a watermarked
    * stream-stream join with bounded state.
    */
  val q23_interval_join: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val v = e.filter($"event_type" === "view").select($"user_id", $"ts".as("v_ts"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
    v.join(c, $"user_id" === $"c_user" &&
        $"c_ts" >= $"v_ts" && $"c_ts" <= $"v_ts" + expr("INTERVAL 5 MINUTES"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** As-of join: each click picks up the latest view at-or-before it per
    * user (views deduped to one row per (user, ts) so the match is
    * well-defined; see AsOfJoin scaladoc).
    */
  val q24_asof_join: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val views = e.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("v_id"))
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id", $"ts")
    AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "ts", Seq("v_id"))
      .select($"c_id", $"user_id", $"v_id")
  }

  /** Session windows with a 30-minute gap, batch formulation: break rows
    * where the gap exceeds the threshold, running-sum the breaks into
    * session ids, aggregate. (Streaming uses session_window() — see the
    * streaming specs; this is the classic batch sessionization plan.)
    */
  val q25_sessionize: Q = (s, d) => {
    import s.implicits._
    val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val prev = lag($"ts", 1).over(wo)
    val brk = when(prev.isNull ||
      unix_millis($"ts") - unix_millis(prev) > 30L * 60 * 1000, 1).otherwise(0)
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("sid", sum(brk).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min($"ts")).as("s_start_ms"),
        unix_millis(max($"ts")).as("s_end_ms"))
      .select($"user_id", $"sid".cast("int").as("session_id"),
        $"n_events", $"s_start_ms", $"s_end_ms")
  }

  /** CUMULATE(max 10 min, step 2 min) via the Cumulate operator. */
  val q26_cumulate_window: Q = (s, d) => {
    import s.implicits._
    Cumulate.assign(Tables.events(s, d), "ts", 600000L, 120000L)
      .groupBy($"w_start", $"w_end", $"event_type")
      .agg(count(lit(1)).as("n"), money(sum($"value")).as("sum_value"))
  }

  /** HOP(10 min size, 5 min slide): each row lands in exactly 2 windows
    * (shared builder with the streaming path).
    */
  val q41_hop_window: Q = (s, d) => {
    WindowOps.hopAgg(Tables.events(s, d), "10 minutes", "5 minutes")
  }

  /** MATCH_RECOGNIZE-class quantified pattern per user over the event
    * stream: `view{1,2} error? click` with greedy quantifiers, strict
    * contiguity, AFTER MATCH SKIP PAST LAST ROW — the general NFA
    * (quantifier bounds + optional steps), not the fixed A B+ C shape.
    * Order is arrival order (event_id); WITHIN is unbounded here (bounded
    * WITHIN + SKIP TO NEXT ROW are spec-covered in CepSimilaritySpec).
    * DuckDB-oracled via RE2 `regexp_extract_all` over the per-user symbol
    * string — non-overlapping leftmost-greedy regex scanning is exactly
    * the SKIP PAST LAST ROW contiguity semantics.
    */
  val q55_cep_quantified: Q = (s, d) => {
    import s.implicits._
    import graft.operators.Cep
    val ev = Tables.events(s, d)
      .select($"user_id".cast("long").as("key"),
        $"event_id".cast("long").as("id"),
        $"event_id".cast("long").as("ts"),
        substring($"event_type", 1, 1).as("sym"),
        lit(0.0).as("value"))
      .as[Cep.Event]
    Cep.matchPattern(ev,
        Seq(Cep.times("v", 1, 2), Cep.opt("e"), Cep.once("c")),
        withinMs = Long.MaxValue / 4, skip = Cep.SkipPastLastRow)
      .groupBy($"key")
      .agg(count(lit(1)).as("n_matches"),
        sum($"n_events").cast("long").as("n_matched_events"))
      .select($"key".as("user_id"), $"n_matches", $"n_matched_events")
  }

  /** SQL-text MATCH_RECOGNIZE ([U] flink-sql-parser SqlMatchRecognize):
    * the same CEP class as q55 but driven through the SQL surface —
    * `graft.plans.MatchRecognize.sql` rewrites the embedded clause (under
    * a `spark.sql.extensions=graft.GraftExtensions` session, plain
    * `spark.sql` accepts it too). Pattern `V{2,3} C`, strict contiguity,
    * SKIP PAST LAST ROW; oracled with the q55 RE2-regex technique.
    */
  val q73_match_recognize_sql: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"))
      .createOrReplaceTempView("q73_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, count(*) AS n_matches,
        | CAST(sum(n_events) AS BIGINT) AS n_matched_events
        |FROM q73_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (V{2,3} C)
        |  DEFINE V AS sym = 'v', C AS sym = 'c'
        |) AS m
        |GROUP BY user_id""".stripMargin)
  }

  /** MATCH_RECOGNIZE alternation ([U] flink-cep GroupPattern; Flink's
    * `(A|B)` pattern class): `(V | E)+ C` — a run of views-or-errors
    * ending in a click — through the SQL surface; the alternation step
    * runs as the UNION of the two DEFINE predicates on the shared NFA
    * (one bitmask test per event, no extra state). Oracled with the q55
    * RE2 technique: `[ve]+c` non-overlapping greedy scanning is exactly
    * strict contiguity + SKIP PAST LAST ROW.
    */
  val q103_mr_alternation: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"))
      .createOrReplaceTempView("q103_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, count(*) AS n_matches,
        | CAST(sum(n_events) AS BIGINT) AS n_matched_events
        |FROM q103_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN ((V | E)+ C)
        |  DEFINE V AS sym = 'v', E AS sym = 'e', C AS sym = 'c'
        |) AS m
        |GROUP BY user_id""".stripMargin)
  }

  /** MATCH_RECOGNIZE PERMUTE ([U] flink-sql-parser via Calcite's
    * row-pattern grammar; SQL standard R010 PERMUTE): `PERMUTE(V, E) C`
    * — a view and an error in EITHER order, then a click. The engine
    * expands the permutations into alternative step sequences tried in
    * lexicographic order (PERMUTE(V, E) ≡ (V E | E V)); the DuckDB
    * oracle is the q55 RE2 technique with the same expansion,
    * `(ve|ev)c` — regex alternation is leftmost-first like the NFA, and
    * every alternative here has the same length, so the match spans
    * cannot differ.
    */
  val q107_mr_permute: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"))
      .createOrReplaceTempView("q107_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, count(*) AS n_matches,
        | CAST(sum(n_events) AS BIGINT) AS n_matched_events
        |FROM q107_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (PERMUTE(V, E) C)
        |  DEFINE V AS sym = 'v', E AS sym = 'e', C AS sym = 'c'
        |) AS m
        |GROUP BY user_id""".stripMargin)
  }

  /** MATCH_RECOGNIZE MEASURES ([U] flink-sql-parser SqlMatchRecognize
    * MEASURES clause): per-variable aggregates on the one-row-per-match
    * output. Pattern `A C` (a view immediately followed by a click, per
    * user in arrival order) keeps every match exactly two consecutive
    * rows, so the DuckDB oracle is exact: a `lead()` window over the
    * same ordering — no regex needed, and SKIP PAST LAST ROW can't
    * differ because 'v' ≠ 'c' makes overlaps impossible.
    */
  val q104_mr_measures: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"value")
      .createOrReplaceTempView("q104_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, n_events, a_val, c_val
        |FROM q104_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES FIRST(A.value) AS a_val, LAST(C.value) AS c_val
        |  PATTERN (A C)
        |  DEFINE A AS sym = 'v', C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** MATCH_RECOGNIZE ALL ROWS PER MATCH ([U] flink-table-runtime
    * operators/match/ one-row vs all-rows emit): every matched row comes
    * back with its full payload plus match_seq / classifier / RUNNING
    * measures. The fixed two-row `A C` pattern keeps the oracle exact:
    * the q104 lead() match table expanded to two output rows per match
    * (the A row sees only FIRST(A.value); the C row both).
    */
  val q105_mr_all_rows: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"value")
      .createOrReplaceTempView("q105_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, event_id, match_seq, classifier, a_run, c_run
        |FROM q105_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES FIRST(A.value) AS a_run, LAST(C.value) AS c_run
        |  ALL ROWS PER MATCH
        |  PATTERN (A C)
        |  DEFINE A AS sym = 'v', C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** MATCH_RECOGNIZE FINAL measures under ALL ROWS PER MATCH ([U]
    * flink-table-runtime operators/match/ — Flink evaluates FINAL
    * against the completed match on every emitted row) plus MIN/MAX on
    * a non-numeric column (running lexicographic max of `event_type`,
    * which for Spark's canonical string forms equals the natural
    * order). Pattern `A{2} C` with A ∈ {view, error}: two candidate
    * starts can never overlap (either overlap position would need the
    * 'c' row to also satisfy A), so the DuckDB lead()-window oracle is
    * exact — the match table is the candidate table, expanded to its
    * three output rows with hand-computed running/final values.
    */
  val q108_mr_final_all_rows: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"event_type", $"value")
      .createOrReplaceTempView("q108_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, event_id, match_seq, classifier,
        | round(a_sum_final, 2) AS a_sum_final, et_max
        |FROM q108_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES FINAL(SUM(A.value)) AS a_sum_final,
        |           RUNNING(MAX(A.event_type)) AS et_max
        |  ALL ROWS PER MATCH
        |  PATTERN (A{2} C)
        |  DEFINE A AS sym IN ('v', 'e'), C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** MATCH_RECOGNIZE MIN/MAX on a non-numeric column under ONE ROW PER
    * MATCH — same `A{2} C` candidate-table oracle as q108 (matches
    * provably cannot overlap), with the per-match least/greatest of the
    * two A rows' `event_type` strings and the numeric SUM alongside.
    */
  val q109_mr_minmax: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"event_type", $"value")
      .createOrReplaceTempView("q109_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, n_events, et_min, et_max,
        | round(a_sum, 2) AS a_sum
        |FROM q109_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES MIN(A.event_type) AS et_min, MAX(A.event_type) AS et_max,
        |           SUM(A.value) AS a_sum
        |  PATTERN (A{2} C)
        |  DEFINE A AS sym IN ('v', 'e'), C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** MATCH_RECOGNIZE SUBSET union variables + CLASSIFIER()/MATCH_NUMBER()
    * ([U] flink-sql-parser SqlMatchRecognize SUBSET; flink-table-runtime
    * MATCH_NUMBER). Same provably-non-overlapping `A{2} C` pattern as
    * q108/q109, so every candidate is a match and MATCH_NUMBER() is the
    * candidate's row_number in event order — the DuckDB oracle is exact.
    * `U = (A, C)` makes SUM/COUNT over the union of both variables' rows.
    */
  val q111_mr_subset: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"value")
      .createOrReplaceTempView("q111_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, round(u_sum, 2) AS u_sum,
        | u_n, last_var, mn
        |FROM q111_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES SUM(U.value) AS u_sum, COUNT(U.*) AS u_n,
        |           CLASSIFIER() AS last_var, MATCH_NUMBER() AS mn
        |  PATTERN (A{2} C)
        |  SUBSET U = (A, C)
        |  DEFINE A AS sym IN ('v', 'e'), C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** Relaxed-contiguity CEP ([U] flink-cep Pattern.followedBy +
    * notFollowedBy): every view followed by a purchase with NO error in
    * between — skip-till-next commits each view to its FIRST following
    * purchase, and the error guard kills the span. Overlapping anchors
    * (every view tried), so the DuckDB oracle is a pure
    * next-purchase/next-error window comparison.
    */
  val q113_cep_followed_by: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      $"user_id".cast("long").as("key"),
      $"event_id".cast("long").as("id"),
      $"event_id".cast("long").as("ts"),
      substring($"event_type", 1, 1).as("sym"),
      lit(0.0).as("value")).as[graft.operators.Cep.Event]
    graft.operators.Cep.matchPatternRelaxed(ev, Seq(
        graft.operators.Cep.next(graft.operators.Cep.once("v")),
        graft.operators.Cep.notFollowedBy("E")(_.sym == "e"),
        graft.operators.Cep.followedBy(graft.operators.Cep.once("p"))),
      withinMs = Long.MaxValue / 4, overlapping = true)
      .toDF().select($"key".as("user_id"), $"start_id", $"end_id", $"n_events")
  }

  /** Funnel analysis with abandoned starts ([U] flink-cep
    * TimedOutPartialMatchHandler — partial matches pruned by the WITHIN
    * window surface as outcomes): every view opens a funnel that either
    * COMPLETES at its first following purchase within the window or
    * resolves as ABANDONED (the deepest partial — here just the view).
    * event_id doubles as the time axis, so the window is 100 ids and
    * the DuckDB oracle is one next-purchase window comparison.
    */
  val q114_funnel: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      $"user_id".cast("long").as("key"),
      $"event_id".cast("long").as("id"),
      $"event_id".cast("long").as("ts"),
      substring($"event_type", 1, 1).as("sym"),
      lit(0.0).as("value")).as[graft.operators.Cep.Event]
    graft.operators.Cep.matchFunnel(ev, Seq(
        graft.operators.Cep.next(graft.operators.Cep.once("v")),
        graft.operators.Cep.followedBy(graft.operators.Cep.once("p"))),
      withinMs = 100L)
      .toDF().select($"key".as("user_id"), $"start_id", $"end_id",
        $"n_events", $"completed")
  }

  /** MATCH_RECOGNIZE reluctant quantifier ([U] flink-cep Quantifier.java
    * reluctant mode — `*?` prefers the FEWEST rows): `(A*? C)` with
    * A = TRUE consumes up to the NEAREST c, so AFTER MATCH SKIP PAST
    * LAST ROW tiles each partition into segments ending at each c —
    * expressible exactly in DuckDB as grouping by the count of
    * preceding c rows. The greedy `(A* C)` would instead emit one
    * match to the LAST c per partition.
    */
  val q112_mr_reluctant: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"))
      .createOrReplaceTempView("q112_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, n_events
        |FROM q112_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  PATTERN (A*? C)
        |  DEFINE A AS TRUE, C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** Aggregates in MATCH_RECOGNIZE DEFINE ([U] flink-cep
    * pattern/conditions/IterativeCondition.java surfacing as SQL running
    * aggregates — Flink evaluates `AVG(V.value) < x` in DEFINE against
    * the partial match's V rows including the candidate row): two views
    * whose RUNNING average spend stays under 40, then a click. `V{2} C`
    * matches provably cannot overlap (an overlap would need a row to be
    * both 'v' and 'c'), so the DuckDB lead-window candidate table is
    * exact: first view under 40 (the one-row average), pair sum under 80
    * (the two-row average — `(a+b)/2 < 40 ⟺ a+b < 80` exactly, division
    * by two is lossless in IEEE doubles).
    */
  val q117_mr_agg_define: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"value")
      .createOrReplaceTempView("q117_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, n_events,
        | round(spend, 2) AS spend
        |FROM q117_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES SUM(V.value) AS spend
        |  PATTERN (V{2} C)
        |  DEFINE V AS sym = 'v' AND AVG(V.value) < 40, C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** Running COUNT cap in DEFINE ([U] flink-cep IterativeCondition — the
    * `times()` quantifier expressed as a running aggregate): `V+` capped
    * by `COUNT(V.*) <= 3` is exactly `V{1,3}`, and greedy regex scanning
    * (`v{1,3}c`, non-overlapping, leftmost) is exactly strict contiguity
    * + SKIP PAST LAST ROW — the q55/q103 oracle technique.
    */
  val q118_mr_count_cap: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"))
      .createOrReplaceTempView("q118_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, count(*) AS n_matches,
        | CAST(sum(n_events) AS BIGINT) AS n_matched_events
        |FROM q118_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  PATTERN (V+ C)
        |  DEFINE V AS sym = 'v' AND COUNT(V.*) <= 3, C AS sym = 'c'
        |) AS m
        |GROUP BY user_id""".stripMargin)
  }

  /** Aggregate DEFINE under ALL ROWS PER MATCH: q117's running-average
    * spend cap replayed row-by-row — each matched row carries the
    * RUNNING SUM(V.value) (the V rows consumed so far; the C row
    * repeats the completed V sum since C is not a V row), the
    * classifier, and the per-partition match ordinal. The fixed-length
    * non-overlapping pattern makes the DuckDB oracle exact: the q117
    * candidate table expanded to three output rows per match with
    * row_number() as match_seq.
    */
  val q123_mr_agg_all_rows: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"value")
      .createOrReplaceTempView("q123_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, event_id, match_seq, classifier,
        | round(spend, 2) AS spend
        |FROM q123_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES SUM(V.value) AS spend
        |  ALL ROWS PER MATCH
        |  PATTERN (V{2} C)
        |  DEFINE V AS sym = 'v' AND AVG(V.value) < 40, C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** MEASURES FIRST/LAST with LOGICAL offsets ([U] flink-docs
    * match_recognize "Logical Offsets" — `FIRST(V.x, n)` is the
    * (n+1)-th row mapped to V from the start, `LAST(V.x, n)` the
    * (n+1)-th from the end): a fixed-length V{3} C pattern so the
    * DuckDB lead-window oracle is exact. `f1` (FIRST offset 1) and `l1`
    * (LAST offset 1) both name the middle V row — the two navigation
    * directions cross-check each other — and `l2` reaches the first.
    */
  val q131_mr_nav_offsets: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"),
        substring($"event_type", 1, 1).as("sym"), $"value")
      .createOrReplaceTempView("q131_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, n_events,
        | round(f1, 2) AS f1, round(l1, 2) AS l1, round(l2, 2) AS l2
        |FROM q131_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES FIRST(V.value, 1) AS f1, LAST(V.value, 1) AS l1,
        |           LAST(V.value, 2) AS l2
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (V{3} C)
        |  DEFINE V AS sym = 'v', C AS sym = 'c'
        |) AS m""".stripMargin)
  }

  /** MATCH_RECOGNIZE PREV navigation ([U] flink-docs match_recognize
    * "Pattern Navigation" — PREV/NEXT are physical offsets over the
    * partition): the classic V-shape price pattern, two falling rows then
    * two rising rows, with the defining variable's own qualifier in
    * DEFINE (`D.value < PREV(D.value)`). AFTER MATCH SKIP TO NEXT ROW +
    * a fixed-length pattern means every qualifying position emits, so
    * the DuckDB lag/lead-window oracle is exact.
    */
  val q110_mr_prev_nav: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id".cast("long").as("user_id"),
        $"event_id".cast("long").as("event_id"), $"value")
      .createOrReplaceTempView("q110_events")
    graft.plans.MatchRecognize.sql(s,
      """SELECT user_id, match_start, match_end, n_events,
        | round(d_sum, 2) AS d_sum, round(u_sum, 2) AS u_sum
        |FROM q110_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES SUM(D.value) AS d_sum, SUM(U.value) AS u_sum
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (D{2} U{2})
        |  DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
        |) AS m""".stripMargin)
  }

  /** SQL-text window TVF ([U] flink-table-planner SqlWindowTableFunction):
    * the q41 hop-window class driven through Flink's SQL surface —
    * `TABLE(HOP(TABLE t, DESCRIPTOR(ts), slide, size))` rewritten by
    * `graft.plans.WindowTvf` into a plain-Spark subquery (under a
    * `spark.sql.extensions=graft.GraftExtensions` session, plain
    * `spark.sql` accepts the syntax too). Oracled by manual hop-bucket
    * expansion in DuckDB.
    */
  val q76_window_tvf_sql: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q76_events")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT window_start, window_end, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM TABLE(HOP(TABLE q76_events, DESCRIPTOR(ts),
        |               INTERVAL '5' MINUTE, INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, event_type""".stripMargin))
  }

  /** Window aggregation with GROUPING SETS ([U] flink-table-planner
    * StreamExecWindowAggregate "window agg supports grouping sets" —
    * Flink requires window_start/window_end OUTSIDE the sets, grouped in
    * every combination): per tumbling window, per-event_type subtotals
    * AND the window total in one pass, Flink's exact SQL shape. Spark's
    * partial grouping-sets syntax matches verbatim; `grouping(...)`
    * disambiguates the total rows from a NULL-typed group.
    */
  val q133_window_grouping_sets: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q133_events")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT window_start, window_end, event_type,
        | CAST(grouping(event_type) AS INT) AS g,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM TABLE(TUMBLE(TABLE q133_events, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, GROUPING SETS ((event_type), ())""".stripMargin))
  }

  /** Window join in SQL ([U] flink-table-planner StreamExecWindowJoin;
    * the reference docs' "window join" — two window-TVF'd streams joined
    * on window_start + window_end + key, so only same-window rows pair):
    * views joined to clicks per (user, 10-minute tumble), both sides
    * driven through the TVF rewrite in ONE statement — the multi-span
    * path of `plans/WindowTvf`. The rewrite leaves a plain equi-join on
    * (window_start, window_end, user_id): an ordinary shuffle-hash join
    * on the window keys, no custom operator, AQE-eligible.
    */
  val q135_window_join_sql: Q = (s, d) => {
    val e = Tables.events(s, d)
    e.filter(col("event_type") === "view").createOrReplaceTempView("q135_views")
    e.filter(col("event_type") === "click").createOrReplaceTempView("q135_clicks")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT L.window_start, L.user_id,
        | L.event_id AS view_id, R.event_id AS click_id,
        | round(L.value + R.value, 2) AS pair_value
        |FROM TABLE(TUMBLE(TABLE q135_views, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) L
        |JOIN TABLE(TUMBLE(TABLE q135_clicks, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) R
        |  ON L.window_start = R.window_start AND L.window_end = R.window_end
        | AND L.user_id = R.user_id""".stripMargin))
  }

  /** Window LEFT OUTER join in SQL ([U] flink-table-planner
    * StreamExecWindowJoin — Flink's window joins support INNER / LEFT /
    * RIGHT / FULL / SEMI / ANTI; q135 covers INNER, this covers LEFT):
    * every view row keeps its (10-minute window, user) identity even
    * when no click shares the window — the unmatched side is NULL, the
    * Flink left-window-join contract. The rewrite leaves an ordinary
    * null-producing shuffle-hash equi-join on (window_start, window_end,
    * user_id); AQE-eligible, no custom operator.
    */
  val q137_window_outer_join: Q = (s, d) => {
    val e = Tables.events(s, d)
    e.filter(col("event_type") === "view").createOrReplaceTempView("q137_views")
    e.filter(col("event_type") === "click").createOrReplaceTempView("q137_clicks")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT L.window_start, L.user_id,
        | L.event_id AS view_id, R.event_id AS click_id,
        | round(L.value + coalesce(R.value, 0.0), 2) AS pair_value
        |FROM TABLE(TUMBLE(TABLE q137_views, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) L
        |LEFT JOIN TABLE(TUMBLE(TABLE q137_clicks, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) R
        |  ON L.window_start = R.window_start AND L.window_end = R.window_end
        | AND L.user_id = R.user_id""".stripMargin))
  }

  /** Window SEMI + ANTI join in SQL ([U] flink-table-planner
    * StreamExecWindowJoin semi/anti variants — Flink expresses them as
    * [NOT] EXISTS / IN with both sides window-TVF'd): view rows tagged by
    * whether the same (10-minute window, user) also saw a click. The
    * EXISTS side plans as LeftSemi and the NOT EXISTS side as LeftAnti —
    * exactly the physical shapes Flink's window semi/anti joins use; the
    * correlated subquery's TVF span goes through the same text rewrite.
    */
  val q138_window_semi_anti: Q = (s, d) => {
    val e = Tables.events(s, d)
    e.filter(col("event_type") === "view").createOrReplaceTempView("q138_views")
    e.filter(col("event_type") === "click").createOrReplaceTempView("q138_clicks")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT L.window_start, L.user_id, L.event_id AS view_id, 'has_click' AS kind
        |FROM TABLE(TUMBLE(TABLE q138_views, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) L
        |WHERE EXISTS (
        |  SELECT 1 FROM TABLE(TUMBLE(TABLE q138_clicks, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) R
        |  WHERE R.window_start = L.window_start AND R.window_end = L.window_end
        |    AND R.user_id = L.user_id)
        |UNION ALL
        |SELECT L.window_start, L.user_id, L.event_id AS view_id, 'no_click' AS kind
        |FROM TABLE(TUMBLE(TABLE q138_views, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) L
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM TABLE(TUMBLE(TABLE q138_clicks, DESCRIPTOR(ts), INTERVAL '10' MINUTE)) R
        |  WHERE R.window_start = L.window_start AND R.window_end = L.window_end
        |    AND R.user_id = L.user_id)""".stripMargin))
  }

  /** Flink's windowed Top-N SQL pattern ([U] flink-table-runtime
    * rank/WindowRankOperator; the docs' canonical "top N per window"
    * recipe): ROW_NUMBER over (PARTITION BY window_start) on top of a
    * TUMBLE TVF aggregate, filtered to rn <= 3 — the whole statement as
    * SQL text through the dialect chain. Spark prunes the rank with
    * WindowGroupLimit, so no window sorts more than N+ rows per
    * partition at any scale.
    */
  val q101_window_topn_sql: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q101_events")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT window_start, event_type, cnt, sum_value, rn FROM (
        |  SELECT window_start, event_type, cnt, sum_value,
        |         ROW_NUMBER() OVER (PARTITION BY window_start
        |                            ORDER BY cnt DESC, event_type) AS rn
        |  FROM (
        |    SELECT window_start, event_type, count(*) AS cnt,
        |           round(sum(value), 2) AS sum_value
        |    FROM TABLE(TUMBLE(TABLE q101_events, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        |    GROUP BY window_start, event_type))
        |WHERE rn <= 3""".stripMargin))
  }

  /** Windowed coGroup (SURVEY.md §2.3 "windowed join / coGroup"): views
    * and clicks per (user, 10-min window) presented TOGETHER — keys
    * active on only one side still emit (unlike a join). Per-side sums
    * fold the sorted arrays so both engines add in the same order.
    */
  val q77_cogroup_window: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    val views = e.filter($"event_type" === "view").select($"user_id", $"ts", $"value")
    val clicks = e.filter($"event_type" === "click").select($"user_id", $"ts", $"value")
    graft.operators.CoGroup.tumbling(views, clicks, "user_id", "ts", "value", "10 minutes")
      .select($"key".as("user_id"), $"window_start",
        size($"a_values").cast("long").as("n_views"),
        size($"b_values").cast("long").as("n_clicks"),
        round(aggregate($"a_values", lit(0.0), (acc, x) => acc + x), 2).as("sum_views"),
        round(aggregate($"b_values", lit(0.0), (acc, x) => acc + x), 2).as("sum_clicks"))
  }

  /** Batch window deduplication (SURVEY.md §2.5/§2.6 "window dedup" TVF
    * post-op): first event per (user, 5-min window) by (ts, event_id) —
    * the `ROW_NUMBER() OVER (PARTITION BY window, key ORDER BY rowtime)
    * = 1` Flink shape; the streaming counterpart is StreamingWindowDedup
    * (WindowRankSpec).
    */
  val q78_window_dedup: Q = (s, d) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(window($"ts", "5 minutes"), $"user_id")
      .orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", window($"ts", "5 minutes").getField("start").as("window_start"),
        $"event_id", $"event_type", round($"value", 2).as("value"))
  }

  /** Flink 1.x LEGACY group-window SQL ([U] flink-table-planner
    * SqlStdOperatorTable TUMBLE group function + TUMBLE_START/TUMBLE_END
    * auxiliaries; SURVEY.md §2.5): the pre-TVF syntax old pipelines still
    * carry, lowered by `graft.plans.LegacyGroupWindow` onto the window-TVF
    * form and from there to a plain-Spark subquery (under a
    * `spark.sql.extensions=graft.GraftExtensions` session, plain
    * `spark.sql` accepts the syntax too). Same oracle technique as q76.
    */
  val q81_legacy_group_window: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q81_events")
    s.sql(graft.plans.WindowTvf.rewrite(graft.plans.LegacyGroupWindow.rewrite(
      """SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) AS window_start,
        |  TUMBLE_END(ts, INTERVAL '5' MINUTE) AS window_end,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM q81_events
        |GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE), event_type""".stripMargin)))
  }

  /** Flink temporal-join SQL (`FOR SYSTEM_TIME AS OF`, [U]
    * flink-table-planner SqlSnapshot): the q24 as-of class driven through
    * the SQL surface — `graft.plans.SystemTimeJoin` lowers the clause
    * onto the AsOfJoin carry-forward plan (under a
    * `spark.sql.extensions=graft.GraftExtensions` session, plain
    * `spark.sql` accepts it too). INNER semantics (version-less clicks
    * drop); oracled by DuckDB's native ASOF JOIN.
    */
  val q82_system_time_join: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    e.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("v_id"))
      .createOrReplaceTempView("q82_views")
    e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id", $"ts")
      .createOrReplaceTempView("q82_clicks")
    graft.plans.SystemTimeJoin.sql(s,
      """SELECT c.c_id, c.user_id, r.v_id
        |FROM q82_clicks AS c
        |JOIN q82_views FOR SYSTEM_TIME AS OF c.ts AS r
        |  ON r.user_id = c.user_id""".stripMargin)
  }

  /** Time-range OVER aggregation (SURVEY.md §2.5 OVER windows; [U]
    * flink-table-runtime operators/over/RowTimeRangeBoundedPrecedingFunction):
    * the Flink SQL `RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND
    * CURRENT ROW` rowtime frame — per-user rolling 10-minute sums/counts.
    * Spark evaluates the same frame natively (range frame over a
    * timestamp ordering); equal-rowtime peers are all included, so the
    * result is deterministic under ts ties. Same SQL text on both
    * engines (DuckDB evaluates the identical frame).
    */
  val q83_time_range_over: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q83_events")
    s.sql(
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 2) AS sum_10m,
        |  count(*) OVER w AS n_10m
        |FROM q83_events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  /** SQL-text CUMULATE TVF (q76's class for the expanding-window
    * function): 2-minute steps inside a 10-minute span, rewritten by
    * `plans/WindowTvf`; oracled by manual cumulate expansion in DuckDB
    * (each row lands in every step-window from its own step to span
    * end — the same explode the rewrite generates).
    */
  val q84_cumulate_tvf_sql: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("q84_events")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT window_start, window_end, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM TABLE(CUMULATE(TABLE q84_events, DESCRIPTOR(ts),
        |               INTERVAL '2' MINUTE, INTERVAL '10' MINUTE))
        |GROUP BY window_start, window_end, event_type""".stripMargin))
  }

  /** Window join through the SQL surface ([U] flink-table-planner
    * StreamPhysicalWindowJoin; SURVEY.md §2.3 "windowed join"): both
    * sides windowed by TUMBLE TVFs, joined on (window_start, key) —
    * the rewrite replaces every TVF span in the statement, so Flink's
    * window-join SQL shape runs as plain Spark joins over the
    * bucketed subqueries. Views joined to clicks per (10-min window,
    * user); oracled by the same two-sided expansion in DuckDB.
    */
  val q85_window_join_sql: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d)
    e.filter($"event_type" === "view").select($"user_id", $"ts", $"value")
      .createOrReplaceTempView("q85_views")
    e.filter($"event_type" === "click").select($"user_id", $"ts", $"value")
      .createOrReplaceTempView("q85_clicks")
    s.sql(graft.plans.WindowTvf.rewrite(
      """SELECT v.window_start, v.user_id,
        |  v.n AS n_views, c.n AS n_clicks,
        |  round(v.sv + c.sv, 2) AS sum_both
        |FROM (SELECT window_start, user_id, count(*) AS n, sum(value) AS sv
        |      FROM TABLE(TUMBLE(TABLE q85_views, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |      GROUP BY window_start, user_id) v
        |JOIN (SELECT window_start, user_id, count(*) AS n, sum(value) AS sv
        |      FROM TABLE(TUMBLE(TABLE q85_clicks, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |      GROUP BY window_start, user_id) c
        |  ON v.window_start = c.window_start AND v.user_id = c.user_id""".stripMargin))
  }

  val queries: Map[String, Q] = Map(
    "q85_window_join_sql" -> q85_window_join_sql,
    "q84_cumulate_tvf_sql" -> q84_cumulate_tvf_sql,
    "q83_time_range_over" -> q83_time_range_over,
    "q82_system_time_join" -> q82_system_time_join,
    "q81_legacy_group_window" -> q81_legacy_group_window,
    "q78_window_dedup" -> q78_window_dedup,
    "q77_cogroup_window" -> q77_cogroup_window,
    "q76_window_tvf_sql" -> q76_window_tvf_sql,
    "q133_window_grouping_sets" -> q133_window_grouping_sets,
    "q135_window_join_sql" -> q135_window_join_sql,
    "q137_window_outer_join" -> q137_window_outer_join,
    "q138_window_semi_anti" -> q138_window_semi_anti,
    "q101_window_topn_sql" -> q101_window_topn_sql,
    "q73_match_recognize_sql" -> q73_match_recognize_sql,
    "q103_mr_alternation" -> q103_mr_alternation,
    "q107_mr_permute" -> q107_mr_permute,
    "q104_mr_measures" -> q104_mr_measures,
    "q105_mr_all_rows" -> q105_mr_all_rows,
    "q108_mr_final_all_rows" -> q108_mr_final_all_rows,
    "q109_mr_minmax" -> q109_mr_minmax,
    "q110_mr_prev_nav" -> q110_mr_prev_nav,
    "q111_mr_subset" -> q111_mr_subset,
    "q112_mr_reluctant" -> q112_mr_reluctant,
    "q117_mr_agg_define" -> q117_mr_agg_define,
    "q118_mr_count_cap" -> q118_mr_count_cap,
    "q123_mr_agg_all_rows" -> q123_mr_agg_all_rows,
    "q131_mr_nav_offsets" -> q131_mr_nav_offsets,
    "q113_cep_followed_by" -> q113_cep_followed_by,
    "q114_funnel" -> q114_funnel,
    "q55_cep_quantified" -> q55_cep_quantified,
    "q41_hop_window" -> q41_hop_window,
    "q22_tumble_window" -> q22_tumble_window,
    "q23_interval_join" -> q23_interval_join,
    "q24_asof_join" -> q24_asof_join,
    "q25_sessionize" -> q25_sessionize,
    "q26_cumulate_window" -> q26_cumulate_window,
  )

  val oracle: Map[String, String] = Map(
    "q85_window_join_sql" ->
      """WITH e AS (SELECT user_id, event_type, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 AS es
        |           FROM events),
        |v AS (SELECT make_timestamp((es // 600) * 600 * 1000000) AS ws, user_id,
        |             count(*) AS n, sum(value) AS sv
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT make_timestamp((es // 600) * 600 * 1000000) AS ws, user_id,
        |             count(*) AS n, sum(value) AS sv
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT v.ws AS window_start, v.user_id,
        |       v.n AS n_views, c.n AS n_clicks,
        |       round(v.sv + c.sv, 2) AS sum_both
        |FROM v JOIN c ON v.ws = c.ws AND v.user_id = c.user_id""".stripMargin,
    "q84_cumulate_tvf_sql" ->
      """WITH e AS (SELECT event_type, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 AS es
        |           FROM events),
        |x AS (SELECT event_type, value, (es // 600) * 600 AS ws,
        |             UNNEST(range((es - (es // 600) * 600) // 120 + 1, 6)) AS k
        |      FROM e)
        |SELECT make_timestamp(ws * 1000000) AS window_start,
        |       make_timestamp((ws + k * 120) * 1000000) AS window_end,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q83_time_range_over" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |                  CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id, user_id,
        |  round(sum(value) OVER w, 2) AS sum_10m,
        |  count(*) OVER w AS n_10m
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW)""".stripMargin,
    "q82_system_time_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, ts, max(event_id) AS v_id FROM e
        |      WHERE event_type = 'view' GROUP BY user_id, ts),
        |c AS (SELECT event_id AS c_id, user_id, ts FROM e WHERE event_type = 'click')
        |SELECT c.c_id, c.user_id, v.v_id
        |FROM c ASOF JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts""".stripMargin,
    "q81_legacy_group_window" ->
      """WITH e AS (SELECT event_type, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 AS es
        |           FROM events)
        |SELECT make_timestamp((es // 300) * 300 * 1000000) AS window_start,
        |       make_timestamp(((es // 300) * 300 + 300) * 1000000) AS window_end,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM e GROUP BY 1, 2, 3""".stripMargin,
    "q77_cogroup_window" ->
      """WITH v AS (SELECT user_id,
        |                  make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP))//600000)*600000000) AS ws,
        |                  value FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id,
        |             make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP))//600000)*600000000) AS ws,
        |             value FROM events WHERE event_type = 'click'),
        |va AS (SELECT user_id, ws, count(*) AS nv,
        |              list_aggregate(list_sort(list(value)), 'sum') AS sv
        |       FROM v GROUP BY 1, 2),
        |ca AS (SELECT user_id, ws, count(*) AS nc,
        |              list_aggregate(list_sort(list(value)), 'sum') AS sc
        |       FROM c GROUP BY 1, 2)
        |SELECT user_id, ws AS window_start,
        |       coalesce(nv, 0) AS n_views, coalesce(nc, 0) AS n_clicks,
        |       round(coalesce(sv, 0.0), 2) AS sum_views,
        |       round(coalesce(sc, 0.0), 2) AS sum_clicks
        |FROM va FULL OUTER JOIN ca USING (user_id, ws)""".stripMargin,
    "q78_window_dedup" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  CAST(ts AS TIMESTAMP) AS t,
        |                  make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP))//300000)*300000000) AS ws
        |           FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY ws, user_id
        |                                   ORDER BY t, event_id) AS rn
        |      FROM e)
        |SELECT user_id, ws AS window_start, event_id, event_type,
        |       round(value, 2) AS value
        |FROM r WHERE rn = 1""".stripMargin,
    "q101_window_topn_sql" ->
      """WITH w AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |                  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT window_start, event_type, cnt, sum_value,
        |             row_number() OVER (PARTITION BY window_start
        |                                ORDER BY cnt DESC, event_type) AS rn
        |      FROM w)
        |SELECT window_start, event_type, cnt, sum_value, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 3""".stripMargin,
    "q135_window_join_sql" ->
      """WITH v AS (SELECT user_id, event_id, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id, value,
        |             epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |      FROM events WHERE event_type = 'click')
        |SELECT make_timestamp(v.k * 600 * 1000000) AS window_start,
        |       v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |       round(v.value + c.value, 2) AS pair_value
        |FROM v JOIN c ON v.k = c.k AND v.user_id = c.user_id""".stripMargin,
    "q137_window_outer_join" ->
      """WITH v AS (SELECT user_id, event_id, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id, value,
        |             epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |      FROM events WHERE event_type = 'click')
        |SELECT make_timestamp(v.k * 600 * 1000000) AS window_start,
        |       v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |       round(v.value + coalesce(c.value, 0.0), 2) AS pair_value
        |FROM v LEFT JOIN c ON v.k = c.k AND v.user_id = c.user_id""".stripMargin,
    "q138_window_semi_anti" ->
      """WITH v AS (SELECT user_id, event_id,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id,
        |             epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |      FROM events WHERE event_type = 'click')
        |SELECT make_timestamp(v.k * 600 * 1000000) AS window_start,
        |       v.user_id, v.event_id AS view_id, 'has_click' AS kind
        |FROM v WHERE EXISTS (SELECT 1 FROM c WHERE c.k = v.k AND c.user_id = v.user_id)
        |UNION ALL
        |SELECT make_timestamp(v.k * 600 * 1000000) AS window_start,
        |       v.user_id, v.event_id AS view_id, 'no_click' AS kind
        |FROM v WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.k = v.k AND c.user_id = v.user_id)""".stripMargin,
    "q133_window_grouping_sets" ->
      """WITH e AS (SELECT event_type, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 // 600 AS k
        |           FROM events)
        |SELECT make_timestamp(k * 600 * 1000000) AS window_start,
        |       make_timestamp((k + 1) * 600 * 1000000) AS window_end,
        |       event_type, CAST(grouping(event_type) AS INT) AS g,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM e
        |GROUP BY GROUPING SETS ((k, event_type), (k))""".stripMargin,
    "q76_window_tvf_sql" ->
      """WITH e AS (SELECT event_type, value,
        |                  epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 AS es
        |           FROM events),
        |x AS (SELECT event_type, value,
        |             UNNEST(range((es - 600) // 300 + 1, es // 300 + 1)) AS k
        |      FROM e)
        |SELECT make_timestamp(k * 300 * 1000000) AS window_start,
        |       make_timestamp((k * 300 + 600) * 1000000) AS window_end,
        |       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q73_match_recognize_sql" ->
      """WITH s AS (SELECT user_id,
        |                  string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS str
        |           FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(str, 'v{2,3}c') AS ms FROM s)
        |SELECT user_id, CAST(len(ms) AS BIGINT) AS n_matches,
        |       CAST(list_sum(list_transform(ms, x -> length(x))) AS BIGINT) AS n_matched_events
        |FROM m WHERE len(ms) > 0""".stripMargin,
    "q105_mr_all_rows" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym, value,
        |                  lead(event_id) OVER w AS nid,
        |                  lead(substr(event_type, 1, 1)) OVER w AS nsym,
        |                  lead(value) OVER w AS nval
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |m AS (SELECT user_id, event_id AS a_id, nid AS c_id,
        |             value AS a_val, nval AS c_val,
        |             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS match_seq
        |      FROM e WHERE sym = 'v' AND nsym = 'c')
        |SELECT user_id, a_id AS event_id, CAST(match_seq AS BIGINT) AS match_seq,
        |       'A' AS classifier, a_val AS a_run, CAST(NULL AS DOUBLE) AS c_run
        |FROM m
        |UNION ALL
        |SELECT user_id, c_id AS event_id, CAST(match_seq AS BIGINT) AS match_seq,
        |       'C' AS classifier, a_val AS a_run, c_val AS c_run
        |FROM m""".stripMargin,
    "q108_mr_final_all_rows" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym,
        |                  event_type, value,
        |                  lead(event_id) OVER w AS id1,
        |                  lead(substr(event_type, 1, 1)) OVER w AS sym1,
        |                  lead(event_type) OVER w AS et1,
        |                  lead(value) OVER w AS v1,
        |                  lead(event_id, 2) OVER w AS id2,
        |                  lead(substr(event_type, 1, 1), 2) OVER w AS sym2
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |m AS (SELECT user_id, event_id AS id0, id1, id2,
        |             event_type AS et0, et1, value AS v0, v1,
        |             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS match_seq
        |      FROM e WHERE sym IN ('v','e') AND sym1 IN ('v','e') AND sym2 = 'c')
        |SELECT user_id, id0 AS event_id, CAST(match_seq AS BIGINT) AS match_seq,
        |       'A' AS classifier, round(v0 + v1, 2) AS a_sum_final, et0 AS et_max
        |FROM m
        |UNION ALL
        |SELECT user_id, id1, CAST(match_seq AS BIGINT), 'A',
        |       round(v0 + v1, 2), greatest(et0, et1)
        |FROM m
        |UNION ALL
        |SELECT user_id, id2, CAST(match_seq AS BIGINT), 'C',
        |       round(v0 + v1, 2), greatest(et0, et1)
        |FROM m""".stripMargin,
    "q109_mr_minmax" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym,
        |                  event_type, value,
        |                  lead(event_id) OVER w AS id1,
        |                  lead(substr(event_type, 1, 1)) OVER w AS sym1,
        |                  lead(event_type) OVER w AS et1,
        |                  lead(value) OVER w AS v1,
        |                  lead(event_id, 2) OVER w AS id2,
        |                  lead(substr(event_type, 1, 1), 2) OVER w AS sym2
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id AS match_start, id2 AS match_end,
        |       CAST(3 AS INTEGER) AS n_events,
        |       least(event_type, et1) AS et_min, greatest(event_type, et1) AS et_max,
        |       round(value + v1, 2) AS a_sum
        |FROM e WHERE sym IN ('v','e') AND sym1 IN ('v','e') AND sym2 = 'c'""".stripMargin,
    "q114_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         min(CASE WHEN event_type = 'purchase' THEN event_id END)
        |           OVER (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
        |  FROM events)
        |SELECT user_id, event_id AS start_id,
        |       CASE WHEN next_p IS NOT NULL AND next_p - event_id <= 100
        |            THEN next_p ELSE event_id END AS end_id,
        |       CASE WHEN next_p IS NOT NULL AND next_p - event_id <= 100
        |            THEN CAST(2 AS INTEGER) ELSE CAST(1 AS INTEGER) END AS n_events,
        |       (next_p IS NOT NULL AND next_p - event_id <= 100) AS completed
        |FROM e WHERE event_type = 'view'""".stripMargin,
    "q113_cep_followed_by" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         min(CASE WHEN event_type = 'purchase' THEN event_id END)
        |           OVER (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p,
        |         min(CASE WHEN event_type = 'error' THEN event_id END)
        |           OVER (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_e
        |  FROM events)
        |SELECT user_id, event_id AS start_id, next_p AS end_id,
        |       CAST(2 AS INTEGER) AS n_events
        |FROM e
        |WHERE event_type = 'view' AND next_p IS NOT NULL
        |  AND (next_e IS NULL OR next_p < next_e)""".stripMargin,
    "q112_mr_reluctant" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym,
        |                  coalesce(sum(CASE WHEN substr(event_type, 1, 1) = 'c'
        |                               THEN 1 ELSE 0 END)
        |                    OVER (PARTITION BY user_id ORDER BY event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                    0) AS seg
        |           FROM events),
        |g AS (SELECT user_id, seg, min(event_id) AS match_start,
        |             max(event_id) AS match_end, count(*) AS n,
        |             max(CASE WHEN sym = 'c' THEN 1 ELSE 0 END) AS has_c
        |      FROM e GROUP BY 1, 2)
        |SELECT user_id, match_start, match_end, CAST(n AS INTEGER) AS n_events
        |FROM g WHERE has_c = 1""".stripMargin,
    "q111_mr_subset" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym, value,
        |                  lead(substr(event_type, 1, 1)) OVER w AS sym1,
        |                  lead(value) OVER w AS v1,
        |                  lead(substr(event_type, 1, 1), 2) OVER w AS sym2,
        |                  lead(value, 2) OVER w AS v2,
        |                  lead(event_id, 2) OVER w AS id2
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |m AS (SELECT user_id, event_id, id2, value, v1, v2,
        |             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS mn
        |      FROM e WHERE sym IN ('v','e') AND sym1 IN ('v','e') AND sym2 = 'c')
        |SELECT user_id, event_id AS match_start, id2 AS match_end,
        |       round(value + v1 + v2, 2) AS u_sum, CAST(3 AS BIGINT) AS u_n,
        |       'C' AS last_var, CAST(mn AS BIGINT) AS mn
        |FROM m""".stripMargin,
    "q131_mr_nav_offsets" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym, value,
        |                  lead(substr(event_type, 1, 1), 1) OVER w AS s1,
        |                  lead(substr(event_type, 1, 1), 2) OVER w AS s2,
        |                  lead(substr(event_type, 1, 1), 3) OVER w AS s3,
        |                  lead(value, 1) OVER w AS v1,
        |                  lead(event_id, 3) OVER w AS id3
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id AS match_start, id3 AS match_end,
        |       CAST(4 AS INTEGER) AS n_events,
        |       round(v1, 2) AS f1, round(v1, 2) AS l1, round(value, 2) AS l2
        |FROM e WHERE sym = 'v' AND s1 = 'v' AND s2 = 'v' AND s3 = 'c'""".stripMargin,
    "q110_mr_prev_nav" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |                  lag(value) OVER w AS pv,
        |                  lead(value, 1) OVER w AS v1,
        |                  lead(value, 2) OVER w AS v2,
        |                  lead(value, 3) OVER w AS v3,
        |                  lead(event_id, 3) OVER w AS id3
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id AS match_start, id3 AS match_end,
        |       CAST(4 AS INTEGER) AS n_events,
        |       round(value + v1, 2) AS d_sum, round(v2 + v3, 2) AS u_sum
        |FROM e
        |WHERE value < pv AND v1 < value AND v2 > v1 AND v3 > v2""".stripMargin,
    "q104_mr_measures" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym, value,
        |                  lead(event_id) OVER w AS nid,
        |                  lead(substr(event_type, 1, 1)) OVER w AS nsym,
        |                  lead(value) OVER w AS nval
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id AS match_start, nid AS match_end,
        |       CAST(2 AS INTEGER) AS n_events, value AS a_val, nval AS c_val
        |FROM e WHERE sym = 'v' AND nsym = 'c'""".stripMargin,
    "q117_mr_agg_define" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym, value,
        |                  lead(event_id, 2) OVER w AS id2,
        |                  lead(substr(event_type, 1, 1)) OVER w AS sym1,
        |                  lead(substr(event_type, 1, 1), 2) OVER w AS sym2,
        |                  lead(value) OVER w AS v1
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id AS match_start, id2 AS match_end,
        |       CAST(3 AS INTEGER) AS n_events, round(value + v1, 2) AS spend
        |FROM e
        |WHERE sym = 'v' AND sym1 = 'v' AND sym2 = 'c'
        |  AND value < 40 AND value + v1 < 80""".stripMargin,
    "q123_mr_agg_all_rows" ->
      """WITH e AS (SELECT user_id, event_id, substr(event_type, 1, 1) AS sym, value,
        |                  lead(event_id) OVER w AS id1,
        |                  lead(event_id, 2) OVER w AS id2,
        |                  lead(substr(event_type, 1, 1)) OVER w AS sym1,
        |                  lead(substr(event_type, 1, 1), 2) OVER w AS sym2,
        |                  lead(value) OVER w AS v1
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |m AS (SELECT user_id, event_id AS id0, id1, id2, value AS v0, v1
        |      FROM e
        |      WHERE sym = 'v' AND sym1 = 'v' AND sym2 = 'c'
        |        AND value < 40 AND value + v1 < 80),
        |n AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY id0) AS mseq
        |      FROM m)
        |SELECT user_id, id0 AS event_id, mseq AS match_seq, 'V' AS classifier,
        |       round(v0, 2) AS spend FROM n
        |UNION ALL
        |SELECT user_id, id1, mseq, 'V', round(v0 + v1, 2) FROM n
        |UNION ALL
        |SELECT user_id, id2, mseq, 'C', round(v0 + v1, 2) FROM n""".stripMargin,
    "q118_mr_count_cap" ->
      """WITH s AS (SELECT user_id,
        |                  string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS str
        |           FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(str, 'v{1,3}c') AS ms FROM s)
        |SELECT user_id, CAST(len(ms) AS BIGINT) AS n_matches,
        |       CAST(list_sum(list_transform(ms, x -> length(x))) AS BIGINT) AS n_matched_events
        |FROM m WHERE len(ms) > 0""".stripMargin,
    "q107_mr_permute" ->
      """WITH s AS (SELECT user_id,
        |                  string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS str
        |           FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(str, '(ve|ev)c') AS ms FROM s)
        |SELECT user_id, CAST(len(ms) AS BIGINT) AS n_matches,
        |       CAST(list_sum(list_transform(ms, x -> length(x))) AS BIGINT) AS n_matched_events
        |FROM m WHERE len(ms) > 0""".stripMargin,
    "q103_mr_alternation" ->
      """WITH s AS (SELECT user_id,
        |                  string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS str
        |           FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(str, '[ve]+c') AS ms FROM s)
        |SELECT user_id, CAST(len(ms) AS BIGINT) AS n_matches,
        |       CAST(list_sum(list_transform(ms, x -> length(x))) AS BIGINT) AS n_matched_events
        |FROM m WHERE len(ms) > 0""".stripMargin,
    "q55_cep_quantified" ->
      """WITH s AS (SELECT user_id,
        |                  string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS str
        |           FROM events GROUP BY user_id),
        |m AS (SELECT user_id, regexp_extract_all(str, 'v{1,2}e?c') AS ms FROM s)
        |SELECT user_id, CAST(len(ms) AS BIGINT) AS n_matches,
        |       CAST(list_sum(list_transform(ms, x -> length(x))) AS BIGINT) AS n_matched_events
        |FROM m WHERE len(ms) > 0""".stripMargin,
    "q41_hop_window" ->
      """WITH e AS (SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS em FROM events),
        |x AS (SELECT event_type,
        |             ((em//300000) - UNNEST(range(0, 2)))*300000 AS ws
        |      FROM e)
        |SELECT make_timestamp(ws*1000) AS wstart,
        |       make_timestamp((ws + 600000)*1000) AS wend,
        |       event_type, count(*) AS n
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q22_tumble_window" ->
      """SELECT make_timestamp((epoch_ms(CAST(ts AS TIMESTAMP))//300000)*300000000) AS wstart,
        | event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q23_interval_join" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT a.user_id, count(*) AS n_pairs
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'click'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |GROUP BY a.user_id""".stripMargin,
    "q24_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, ts, max(event_id) AS v_id FROM e
        |      WHERE event_type = 'view' GROUP BY user_id, ts),
        |c AS (SELECT event_id AS c_id, user_id, ts FROM e WHERE event_type = 'click')
        |SELECT c.c_id, c.user_id, v.v_id
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts""".stripMargin,
    "q25_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (SELECT user_id, event_id, ts,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |      FROM e),
        |s AS (SELECT user_id, event_id, ts,
        |             CASE WHEN pts IS NULL OR epoch_ms(ts) - epoch_ms(pts) > 1800000
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |t AS (SELECT user_id, ts,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s)
        |SELECT user_id, CAST(sid AS INTEGER) AS session_id, count(*) AS n_events,
        |       epoch_ms(min(ts)) AS s_start_ms, epoch_ms(max(ts)) AS s_end_ms
        |FROM t GROUP BY user_id, sid""".stripMargin,
    "q26_cumulate_window" ->
      """WITH e AS (SELECT event_type, value, epoch_ms(CAST(ts AS TIMESTAMP)) AS em FROM events),
        |b AS (SELECT event_type, value, (em//600000)*600000 AS base,
        |             ((em - (em//600000)*600000)//120000)+1 AS k0
        |      FROM e),
        |x AS (SELECT event_type, value, base, UNNEST(range(k0, 6)) AS k FROM b)
        |SELECT make_timestamp(base*1000) AS w_start,
        |       make_timestamp((base + k*120000)*1000) AS w_end,
        |       event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
  )
}
