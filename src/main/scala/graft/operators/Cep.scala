package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.col

/** Minimal CEP — the reference's MATCH_RECOGNIZE / CEP library
  * ([U] flink-cep nfa/NFA.java, pattern/Pattern.java; SURVEY.md §7.4.5:
  * "scope to a minimal NFA ... for the `A B+ C within T` class patterns,
  * do not build the general library").
  *
  * Semantics implemented (matching Flink's MATCH_RECOGNIZE defaults where
  * they exist):
  *  - pattern `A B+ C` with STRICT contiguity (Flink `next()`): any
  *    non-matching symbol aborts the partial match;
  *  - `WITHIN t`: the whole match must fit in `withinMs` of the A event;
  *  - AFTER MATCH SKIP PAST LAST ROW: matches don't overlap;
  *  - events processed in (ts, id) order per key.
  *
  * Execution: hash-repartition on key + `sortWithinPartitions(key, ts,
  * id)` (Spark's external sort — spills, never materializes a key in
  * memory) + a `mapPartitions` scan holding only a WITHIN-bounded
  * lookback buffer ([[boundedScanPartition]]). Per-task memory is
  * bounded by one WITHIN window's occupancy — the same bound Flink's
  * NFA carries via its pruned SharedBuffer — NOT by a key's whole
  * history, so a hot key (one user with 10⁸ events) sorts externally
  * and streams through the scan instead of OOMing the task. Keys are
  * processed independently and distributed by the shuffle, so the
  * operator scales with executors.
  */
object Cep {

  case class Event(key: Long, id: Long, ts: Long, sym: String, value: Double = 0.0)
  case class Match(key: Long, a_id: Long, c_id: Long, n_b: Int, a_ts: Long, c_ts: Long)

  /** NFA register: 0 = idle, 1 = saw A, 2 = saw A B+; plus the pending A
    * and B-count. Pure value so batch and streaming share the stepper and
    * streaming can persist it in ValueState between watermark firings.
    */
  case class NfaState(state: Int, aId: Long, aTs: Long, nB: Int)
  val idle: NfaState = NfaState(0, 0L, 0L, 0)

  /** One NFA transition on a time-ordered event. */
  def step(s: NfaState, e: Event, a: String, b: String, c: String, withinMs: Long)
      : (NfaState, Option[Match]) = {
    val cur = if (s.state != 0 && e.ts - s.aTs > withinMs) idle else s
    (cur.state, e.sym) match {
      case (0, `a`) => (NfaState(1, e.id, e.ts, 0), None)
      case (0, _)   => (cur, None)
      case (1, `b`) => (cur.copy(state = 2, nB = 1), None)
      case (2, `b`) => (cur.copy(nB = cur.nB + 1), None)
      case (2, `c`) =>
        (idle, Some(Match(e.key, cur.aId, e.id, cur.nB, cur.aTs, e.ts)))
      case (_, `a`) => (NfaState(1, e.id, e.ts, 0), None) // restart on fresh A
      case _        => (idle, None) // strict contiguity: abort
    }
  }

  /** Hash-shuffle on key and sort each partition (key, ts, id) — the
    * shared input shape of every batch kernel here. Spark's sort is
    * external (spills past memory), so a hot key never has to fit in RAM.
    */
  private def sortedByKey(ds: Dataset[Event]): Dataset[Event] =
    ds.repartition(col("key")).sortWithinPartitions(col("key"), col("ts"), col("id"))

  /** Events appended to the lookback buffer between rescans. Smaller =
    * tighter memory, more rescan passes over the retained window; the
    * scan cost per event is O(retained/chunk) extra passes.
    */
  private val ScanChunk = 4096

  /** Bounded-memory scan of a key-clustered, (key, ts, id)-sorted
    * partition iterator. `scanFn(events, openEnded, wm)` is one of the
    * shared batch/streaming scans ([[scanAlts]], [[scanRelaxed]],
    * [[scanFunnel]], [[scanMeasures]] via adapters): it emits every match
    * RESOLVED given events up to the horizon and returns the resume
    * index — the first position a future event could still affect.
    * Everything before the resume index is evicted, so the buffer
    * retains at most one WITHIN window of events (plus a chunk): with
    * `wm` = the last buffered timestamp, any anchor older than
    * `withinMs` is closed and resolves definitively, exactly the
    * streaming eviction contract (StreamingCep) replayed over a batch
    * iterator.
    */
  private[graft] def boundedScanPartition[Out](rows: Iterator[Event])(
      scanFn: (Array[Event], Boolean, Long) => (Seq[Out], Int)): Iterator[Out] =
    boundedScanPartitionBy(rows)(_.key, _.ts)(scanFn)

  /** [[boundedScanPartition]] over any row type — the MATCH_RECOGNIZE
    * kernels scan tagged rows keyed by a canonical string, so the key
    * extractor compares by value equality and `tsOf` supplies the order
    * value that closes WITHIN windows. `onNewKey` fires before the first
    * scan of each key run, for per-key carry state (MATCH_NUMBER bases).
    */
  private[graft] def boundedScanPartitionBy[E: scala.reflect.ClassTag, Out](
      rows: Iterator[E])(keyOf: E => Any, tsOf: E => Long)(
      scanFn: (Array[E], Boolean, Long) => (Seq[Out], Int),
      onNewKey: () => Unit = () => ()): Iterator[Out] =
    new Iterator[Out] {
      private val it = rows.buffered
      private val buf = scala.collection.mutable.ArrayBuffer.empty[E]
      private var outIt: Iterator[Out] = Iterator.empty
      private var curKey: Any = null
      private var started = false
      override def hasNext: Boolean = {
        while (!outIt.hasNext && (it.hasNext || buf.nonEmpty)) advance()
        outIt.hasNext
      }
      override def next(): Out = {
        if (!hasNext) throw new NoSuchElementException("end of scan")
        outIt.next()
      }
      private def advance(): Unit = {
        if (buf.isEmpty) {
          val e = it.next()
          // the buffer also drains mid-key when a scan resolves everything
          // in view — only a genuine key change resets per-key carry state
          if (!started || keyOf(e) != curKey) {
            onNewKey(); curKey = keyOf(e); started = true
          }
          buf += e
        }
        val key = keyOf(buf.head)
        var added = 0
        while (added < ScanChunk && it.hasNext && keyOf(it.head) == key) {
          buf += it.next(); added += 1
        }
        val keyDone = !it.hasNext || keyOf(it.head) != key
        if (keyDone) {
          // complete history for this key is in view: close the scan
          val (ms, _) = scanFn(buf.toArray, false, Long.MaxValue)
          buf.clear()
          outIt = ms.iterator
        } else {
          val (ms, resume) = scanFn(buf.toArray, true, tsOf(buf.last))
          buf.dropInPlace(resume)
          outIt = ms.iterator
        }
      }
    }

  /** Detect `a b+ c WITHIN withinMs` per key. The NFA state is O(1), so
    * the scan is a pure single pass over the sorted run — no buffer at
    * all, state resets at each key boundary.
    */
  def abcWithin(ds: Dataset[Event], a: String, b: String, c: String, withinMs: Long)
      : Dataset[Match] = {
    implicit val matchEnc = Encoders.product[Match]
    sortedByKey(ds).mapPartitions { rows =>
      var s = idle
      var curKey = Long.MinValue
      var first = true
      rows.flatMap { e =>
        if (first || e.key != curKey) { s = idle; curKey = e.key; first = false }
        val (ns, m) = step(s, e, a, b, c, withinMs)
        s = ns
        m
      }
    }
  }

  // ----- general pattern matching: quantifiers, optional steps, AFTER
  // MATCH SKIP strategies ([U] flink-cep pattern/Pattern.java times()/
  // optional(), aftermatch/AfterMatchSkipStrategy.java) -----

  /** One pattern step: between `min` and `max` (inclusive) consecutive
    * events accepted by the step's condition. min=0 → optional;
    * (1, MaxTimes) → `+`. Quantifiers are greedy with backtracking
    * (Flink/regex default); `reluctant` flips the backtrack order to
    * fewest-first ([U] flink-cep Quantifier.java greedy()/reluctant() —
    * `+?` `*?` `??` `{n,m}?`).
    */
  sealed trait Step extends Serializable {
    def min: Int
    def max: Int
    def reluctant: Boolean
    def accepts(e: Event): Boolean
    /** Step label — the pattern variable for simple steps; used by the
      * SKIP TO FIRST/LAST `<variable>` strategies to locate the step.
      */
    def name: String
  }

  /** Symbol-equality step (MATCH_RECOGNIZE pattern variable whose DEFINE
    * is `CLASSIFIER() = sym`).
    */
  case class PStep(sym: String, min: Int, max: Int,
      reluctant: Boolean = false) extends Step {
    require(min >= 0 && max >= min, s"bad quantifier {$min,$max}")
    override def accepts(e: Event): Boolean = e.sym == sym
    override def name: String = sym
  }

  /** Predicate step — the general DEFINE clause ([U] flink-cep
    * pattern/conditions/SimpleCondition.java): any per-event condition
    * over the event's attributes.
    */
  case class CondStep(name: String, min: Int, max: Int,
      reluctant: Boolean = false)(val pred: Event => Boolean)
      extends Step {
    require(min >= 0 && max >= min, s"bad quantifier {$min,$max}")
    override def accepts(e: Event): Boolean = pred(e)
  }

  /** Iterative condition ([U] flink-cep pattern/conditions/
    * IterativeCondition.java — Flink's signature CEP feature): the
    * predicate also sees the events already CONSUMED by the current
    * partial match (previous steps plus this step's earlier
    * repetitions, in match order), so conditions like "price above the
    * first event's" are expressible. Supported by the relaxed pattern
    * API ([[matchPatternRelaxed]]); the strict kernel rejects it
    * up front.
    */
  case class CtxStep(name: String, min: Int, max: Int,
      reluctant: Boolean = false)(
      val pred: (Event, IndexedSeq[Event]) => Boolean) extends Step {
    override def accepts(e: Event): Boolean =
      throw new UnsupportedOperationException(
        s"iterative condition $name needs the partial-match context")
  }

  def whenCtx(name: String, min: Int = 1, max: Int = 1, reluctant: Boolean = false)(
      pred: (Event, IndexedSeq[Event]) => Boolean): CtxStep =
    CtxStep(name, min, max, reluctant)(pred)

  val MaxTimes: Int = Int.MaxValue
  def once(sym: String): PStep = PStep(sym, 1, 1)
  def opt(sym: String): PStep = PStep(sym, 0, 1)
  def plus(sym: String): PStep = PStep(sym, 1, MaxTimes)
  def times(sym: String, min: Int, max: Int): PStep = PStep(sym, min, max)
  def when(name: String, min: Int = 1, max: Int = 1, reluctant: Boolean = false)(
      pred: Event => Boolean): CondStep =
    CondStep(name, min, max, reluctant)(pred)
  /** Alternation step — `(A|B)` class patterns ([U] flink-cep
    * GroupPattern): accepts an event whose symbol is ANY of `syms`.
    */
  def anyOf(min: Int, max: Int, syms: String*): CondStep = {
    val set = syms.toSet
    CondStep(syms.mkString("(", "|", ")"), min, max)(e => set.contains(e.sym))
  }

  /** AFTER MATCH SKIP strategy: where the scan resumes after a match. */
  sealed trait AfterMatch extends Serializable
  /** Non-overlapping matches (Flink's default for MATCH_RECOGNIZE). */
  case object SkipPastLastRow extends AfterMatch
  /** Overlapping: resume at the row after the match's first row. */
  case object SkipToNextRow extends AfterMatch
  /** Resume AT the first row the named step matched ([U] flink-cep
    * aftermatch/AfterMatchSkipStrategy.skipToFirst). Like Flink, a
    * resume that would land on the match's own first row (an infinite
    * loop) or on a step that matched no rows raises.
    */
  case class SkipToFirst(variable: String) extends AfterMatch
  /** Resume AT the last row the named step matched (skipToLast). */
  case class SkipToLast(variable: String) extends AfterMatch

  /** Next scan position after a match at [i, end) whose per-step
    * consumption is `takes` — shared by the batch scan, the streaming
    * process, and the SQL rewrite's measured walks. SKIP TO FIRST/LAST
    * resolves the variable to the FIRST step bearing that name (a
    * variable reused across several steps lands on its first step — a
    * documented simplification of Flink's row-level mapping).
    */
  private[graft] def resumeAfter(skip: AfterMatch, i: Int, end: Int,
      steps: IndexedSeq[Step], takes: Array[Int]): Int = {
    def stepPos(v: String, last: Boolean): Int = {
      val si = steps.indexWhere(_.name == v)
      if (si < 0)
        throw new IllegalArgumentException(
          s"AFTER MATCH SKIP TO $v: no pattern step named $v")
      if (takes(si) == 0)
        throw new IllegalArgumentException(
          s"AFTER MATCH SKIP TO $v: the variable matched no rows in this match")
      var pos = i
      var s = 0
      while (s < si) { pos += takes(s); s += 1 }
      val target = if (last) pos + takes(si) - 1 else pos
      if (target == i) // resume on the match's own first row: infinite loop
        throw new IllegalArgumentException(
          s"AFTER MATCH SKIP TO $v would loop on the match's first row")
      target
    }
    skip match {
      case SkipPastLastRow   => end
      case SkipToNextRow     => i + 1
      case SkipToFirst(v)    => stepPos(v, last = false)
      case SkipToLast(v)     => stepPos(v, last = true)
    }
  }

  case class PMatch(key: Long, start_id: Long, end_id: Long,
      start_ts: Long, end_ts: Long, n_events: Int)

  /** Outcome of matching at one start position. */
  private[graft] final val Fail = -1
  private[graft] final val Pending = -2

  /** Greedy backtracking match of `steps` against `syms` anchored at
    * `start`, strict contiguity, all events within `withinMs` of the
    * start event. Returns the exclusive end index, [[Fail]], or — when
    * `openEnded` (streaming: events past the buffer may still arrive) —
    * [[Pending]] if the outcome could change with more events: any step
    * ran into the buffer end before exhausting its quantifier. Matches of
    * zero length are failures. On success, `takesOut` (when non-null)
    * receives how many events each step consumed — the MEASURES hook.
    */
  private[graft] def tryMatchAt(events: Array[Event], ts: Array[Long], start: Int,
      steps: IndexedSeq[Step], withinMs: Long, openEnded: Boolean,
      takesOut: Array[Int] = null): Int = {
    val n = events.length
    var pending = false
    def rec(pos: Int, si: Int): Int = {
      if (si == steps.length) return pos
      val st = steps(si)
      var cnt = 0
      while (cnt < st.max && pos + cnt < n && st.accepts(events(pos + cnt)) &&
        ts(pos + cnt) - ts(start) <= withinMs) cnt += 1
      val atEdge = openEnded && pos + cnt == n && cnt < st.max
      if (st.reluctant) {
        // fewest-first: extend only when the remainder fails. A success
        // is RESOLVED even at the buffer edge — a future event could
        // only extend this step, which reluctant preference rejects —
        // so the edge makes the outcome pending only when every take
        // fails (more events could then enable a longer take).
        var take = st.min
        while (take <= cnt) {
          val r = rec(pos + take, si + 1)
          if (r >= 0) {
            if (takesOut != null) takesOut(si) = take
            return r
          }
          take += 1
        }
        if (atEdge) pending = true
        return Fail
      }
      // greedy stopped at the buffer end with quantifier room left: a
      // future event could extend this step into a MORE preferred
      // (longer) match, so even a present success is unresolved
      if (atEdge) pending = true
      var take = cnt
      while (take >= st.min) {
        val r = rec(pos + take, si + 1)
        if (r >= 0) {
          if (takesOut != null) takesOut(si) = take
          return r
        }
        take -= 1
      }
      Fail
    }
    val r = rec(start, 0)
    if (pending) Pending
    else if (r == start) Fail // empty match (all steps optional): no row consumed
    else r
  }

  /** Sequence alternation — the PERMUTE / pattern-alternative form: try
    * each alternative step sequence in order at `start`; the FIRST that
    * matches wins (the SQL standard's leftmost-alternative preference —
    * PERMUTE(A, B) ≡ (A B | B A) with the permutations in lexicographic
    * order of the listed variables). A higher-preference alternative
    * that is [[Pending]] makes the whole outcome Pending even when a
    * later alternative matches on the buffered events: a future event
    * could still complete the preferred alternative, and committing the
    * lesser one now would emit a match a full-history scan would not.
    * Returns (altIdx, end, takes) on success; (-1, Fail/Pending, null).
    */
  private[graft] def tryMatchAlts(events: Array[Event], ts: Array[Long], start: Int,
      alts: IndexedSeq[IndexedSeq[Step]], withinMs: Long, openEnded: Boolean)
      : (Int, Int, Array[Int]) = {
    var ai = 0
    while (ai < alts.length) {
      val takes = new Array[Int](alts(ai).length)
      tryMatchAt(events, ts, start, alts(ai), withinMs, openEnded, takes) match {
        case Pending => return (-1, Pending, null)
        case Fail    => ai += 1
        case end     => return (ai, end, takes)
      }
    }
    (-1, Fail, null)
  }

  /** Scan a time-sorted run of events: emit resolved matches, return the
    * resume index — the position from which a future scan must re-run
    * (streaming keeps events from there; batch ignores it). `wm` closes
    * the WITHIN window for pending decisions: once `wm - ts(start) >
    * withinMs`, no future event can join a match anchored at `start`.
    */
  private[graft] def scan(events: Array[Event], steps: IndexedSeq[Step],
      withinMs: Long, skip: AfterMatch, openEnded: Boolean, wm: Long)
      : (Seq[PMatch], Int) =
    scanAlts(events, IndexedSeq(steps), withinMs, skip, openEnded, wm)

  /** [[scan]] over alternative step sequences ([[tryMatchAlts]]'
    * preference order); AFTER MATCH SKIP resumes against the matched
    * alternative's own steps, so SKIP TO FIRST/LAST a permuted variable
    * lands wherever THAT permutation placed it.
    */
  private[graft] def scanAlts(events: Array[Event], alts: IndexedSeq[IndexedSeq[Step]],
      withinMs: Long, skip: AfterMatch, openEnded: Boolean, wm: Long)
      : (Seq[PMatch], Int) = {
    val ts = events.map(_.ts)
    val out = scala.collection.mutable.ArrayBuffer.empty[PMatch]
    var i = 0
    var halt = false
    while (i < events.length && !halt) {
      val open = openEnded && wm - ts(i) <= withinMs
      tryMatchAlts(events, ts, i, alts, withinMs, open) match {
        case (_, Pending, _) => halt = true // everything from i stays buffered
        case (_, Fail, _) => i += 1
        case (ai, end, takes) =>
          val e0 = events(i)
          val e1 = events(end - 1)
          out += PMatch(e0.key, e0.id, e1.id, e0.ts, e1.ts, end - i)
          i = resumeAfter(skip, i, end, alts(ai), takes)
      }
    }
    (out.toSeq, i)
  }

  /** Batch pattern match per key: greedy quantified steps with strict
    * contiguity, WITHIN window, and the chosen AFTER MATCH SKIP strategy.
    * Hash shuffle on key + external sort + WITHIN-bounded lookback scan
    * ([[boundedScanPartition]]) — task memory bounded by the window, not
    * the key's history.
    */
  private[graft] def requireNonIterative(steps: Seq[Step]): Unit =
    steps.find(_.isInstanceOf[CtxStep]).foreach(s =>
      throw new IllegalArgumentException(s"iterative condition ${s.name} is " +
        "supported only by the relaxed pattern API (matchPatternRelaxed)"))

  def matchPattern(ds: Dataset[Event], steps: Seq[Step], withinMs: Long,
      skip: AfterMatch = SkipPastLastRow): Dataset[PMatch] = {
    implicit val enc = Encoders.product[PMatch]
    requireNonIterative(steps)
    val stepsIdx = steps.toIndexedSeq
    sortedByKey(ds).mapPartitions { rows =>
      boundedScanPartition(rows) { (events, open, wm) =>
        scan(events, stepsIdx, withinMs, skip, open, wm)
      }
    }
  }

  /** [[matchPattern]] over alternative step sequences — the API-level
    * PERMUTE form ([U] flink-sql-parser's Calcite row-pattern PERMUTE):
    * alternatives try in listed order at each start position and the
    * first match wins ([[tryMatchAlts]]).
    */
  def matchPatternAlts(ds: Dataset[Event], alts: Seq[Seq[Step]], withinMs: Long,
      skip: AfterMatch = SkipPastLastRow): Dataset[PMatch] = {
    implicit val enc = Encoders.product[PMatch]
    alts.foreach(requireNonIterative)
    val a = alts.map(_.toIndexedSeq).toIndexedSeq
    sortedByKey(ds).mapPartitions { rows =>
      boundedScanPartition(rows) { (events, open, wm) =>
        scanAlts(events, a, withinMs, skip, open, wm)
      }
    }
  }

  // ----- relaxed contiguity + negative patterns ([U] flink-cep
  // Pattern.next/followedBy/followedByAny/notNext/notFollowedBy) -----

  /** Contiguity of a step to the previous one: [[NextC]] = strict
    * (Flink `next`), [[FollowedByC]] = skip-till-next — non-matching
    * events between the steps are skipped and the FIRST occurrence is
    * taken, no backtracking to later ones (Flink `followedBy` /
    * SKIP_TILL_NEXT), [[FollowedByAnyC]] = skip-till-any — later
    * occurrences are tried when the remainder fails (Flink
    * `followedByAny` / SKIP_TILL_ANY).
    */
  sealed trait Contiguity extends Serializable
  case object NextC extends Contiguity
  case object FollowedByC extends Contiguity
  case object FollowedByAnyC extends Contiguity

  /** One element of a relaxed-contiguity pattern. */
  sealed trait RelElem extends Serializable
  /** A positive step (consumes events) with its contiguity. The FIRST
    * positive element anchors at the scan position (Flink `begin`), so
    * its contiguity is ignored.
    */
  final case class PosElem(step: Step, contiguity: Contiguity = NextC) extends RelElem
  /** A negative pattern (consumes nothing): `strict` asserts the
    * immediate next event does not match (Flink `notNext`); relaxed
    * asserts NO matching event occurs in the span skipped before the
    * next positive step's match (Flink `notFollowedBy`). Like Flink, a
    * pattern cannot END with a relaxed negative element.
    */
  final case class NegElem(name: String, strict: Boolean)(val pred: Event => Boolean)
      extends RelElem

  def next(s: Step): RelElem = PosElem(s, NextC)
  def followedBy(s: Step): RelElem = PosElem(s, FollowedByC)
  def followedByAny(s: Step): RelElem = PosElem(s, FollowedByAnyC)
  def notNext(name: String)(pred: Event => Boolean): RelElem =
    NegElem(name, strict = true)(pred)
  def notFollowedBy(name: String)(pred: Event => Boolean): RelElem =
    NegElem(name, strict = false)(pred)

  /** Relaxed-contiguity match anchored at `start`: returns (end, consumed
    * indices) or (Fail/Pending, null). Pending (openEnded only) when the
    * outcome could change with more events — a quantifier or an
    * occurrence search ran into the buffer end, or a strict negative had
    * no next event to test yet.
    */
  private[graft] def tryMatchRelaxed(events: Array[Event], ts: Array[Long],
      start: Int, elems: IndexedSeq[RelElem], withinMs: Long,
      openEnded: Boolean,
      partialOut: scala.collection.mutable.ArrayBuffer[Int] = null)
      : (Int, IndexedSeq[Int]) = {
    val n = events.length
    var pending = false
    val consumed = scala.collection.mutable.ArrayBuffer.empty[Int]
    val firstPos = elems.indexWhere(_.isInstanceOf[PosElem])
    // deepest partial ever reached — the timed-out/abandoned prefix
    def snapshotPartial(): Unit =
      if (partialOut != null && consumed.length > partialOut.length) {
        partialOut.clear(); partialOut ++= consumed
      }

    def inWindow(j: Int): Boolean = ts(j) - ts(start) <= withinMs

    // guard: pending notFollowedBy predicates to verify over the span
    // skipped before the next positive match
    def rec(pos: Int, ei: Int, guards: List[Event => Boolean]): Int = {
      if (ei == elems.length) return pos
      elems(ei) match {
        case ne: NegElem if ne.strict =>
          if (pos >= n) { if (openEnded) pending = true; return Fail }
          if (ne.pred(events(pos))) Fail else rec(pos, ei + 1, guards)
        case ne: NegElem =>
          rec(pos, ei + 1, ne.pred :: guards)
        case PosElem(st, contig0) =>
          // first positive element anchors at the scan position (begin)
          val contig = if (ei == firstPos) NextC else contig0
          def guarded(j: Int): Boolean = guards.exists(g => g(events(j)))
          // iterative conditions see the partial match: prior steps'
          // consumed events plus this step's earlier repetitions
          def acceptsAt(j: Int, p: Int, taken: Int, mark: Int): Boolean = st match {
            case cs: CtxStep =>
              val ctx = (consumed.view.take(mark).map(events(_)) ++
                (j until j + taken).map(events(_))).toIndexedSeq
              cs.pred(events(p), ctx)
            case _ => st.accepts(events(p))
          }
          def attempt(j: Int): Int = {
            val mark = consumed.length
            // greedy (or reluctant) consecutive consumption at j, then rest
            var cnt = 0
            while (cnt < st.max && j + cnt < n &&
              acceptsAt(j, j + cnt, cnt, mark) && inWindow(j + cnt)) cnt += 1
            val atEdge = openEnded && j + cnt == n && cnt < st.max
            def tryTake(take: Int): Int = {
              consumed.remove(mark, consumed.length - mark)
              var k = 0
              while (k < take) { consumed += j + k; k += 1 }
              if (take >= st.min) snapshotPartial()
              rec(j + take, ei + 1, Nil)
            }
            if (st.reluctant) {
              var take = st.min
              while (take <= cnt) {
                val r = tryTake(take)
                if (r >= 0) return r
                take += 1
              }
              if (atEdge) pending = true
              consumed.remove(mark, consumed.length - mark)
              Fail
            } else {
              if (atEdge) pending = true
              var take = cnt
              while (take >= st.min) {
                val r = tryTake(take)
                if (r >= 0) return r
                take -= 1
              }
              consumed.remove(mark, consumed.length - mark)
              Fail
            }
          }
          contig match {
            case NextC =>
              // the skipped span is empty under strict contiguity, so
              // any pending notFollowedBy guards hold vacuously
              attempt(pos)
            case FollowedByC | FollowedByAnyC =>
              var j = pos
              while (j < n && inWindow(j)) {
                if (guarded(j)) return Fail // negative pattern hit first
                val occ = st.min == 0 ||
                  acceptsAt(j, j, 0, consumed.length) // first repetition at j
                if (occ) {
                  val r = attempt(j)
                  if (r >= 0) return r
                  if (contig == FollowedByC && st.min > 0)
                    return Fail // skip-till-next commits to the first occurrence
                }
                j += 1
              }
              if (openEnded && j == n) pending = true // occurrence may still arrive
              Fail
          }
      }
    }

    val r = rec(start, 0, Nil)
    if (pending) (Pending, null)
    else if (r == Fail || consumed.isEmpty) (Fail, null) // zero-length: no match
    else (r, consumed.toIndexedSeq)
  }

  /** One relaxed-pattern match: span ends plus how many events were
    * CONSUMED (skipped events in relaxed gaps are not counted).
    */
  case class RMatch(key: Long, start_id: Long, end_id: Long,
      start_ts: Long, end_ts: Long, n_events: Int)

  /** Batch relaxed-contiguity pattern match per key ([U] flink-cep
    * CEP.pattern with followedBy/notFollowedBy chains). AFTER MATCH:
    * non-overlapping — the scan resumes past the last CONSUMED row
    * (Flink's NO_SKIP emits overlapping branch matches; the reference's
    * common deployment uses skip-past, which is what a non-branching
    * scan produces). Same distribution shape as [[matchPattern]].
    */
  def matchPatternRelaxed(ds: Dataset[Event], elems: Seq[RelElem],
      withinMs: Long, overlapping: Boolean = false): Dataset[RMatch] = {
    implicit val enc = Encoders.product[RMatch]
    val el = elems.toIndexedSeq
    validateRelaxed(el) // fail on the driver, not wrapped in a task error
    sortedByKey(ds).mapPartitions { rows =>
      boundedScanPartition(rows) { (events, open, wm) =>
        scanRelaxed(events, events.map(_.ts), el, withinMs, overlapping, open, wm)
      }
    }
  }

  /** One funnel outcome: a COMPLETED match, or an ABANDONED start — the
    * deepest partial the anchor reached without completing ([U]
    * flink-cep TimedOutPartialMatchHandler / CEP.select timeout tag:
    * Flink surfaces partial matches pruned by the WITHIN window; here
    * every anchored start resolves to exactly one outcome — completed,
    * abandoned, or nothing if even the first step never matched).
    */
  case class FunnelOut(key: Long, start_id: Long, end_id: Long,
      start_ts: Long, end_ts: Long, n_events: Int, completed: Boolean)

  /** Funnel analysis over a relaxed-contiguity pattern: OVERLAPPING
    * anchors (every event that satisfies the first step opens a funnel),
    * each resolving to completed=true with its consumed rows or
    * completed=false with the deepest partial reached. Batch; the
    * streaming counterpart is `StreamingCep.matchFunnel`, where an open
    * funnel resolves as abandoned once the watermark passes its WITHIN
    * window.
    */
  def matchFunnel(ds: Dataset[Event], elems: Seq[RelElem],
      withinMs: Long): Dataset[FunnelOut] = {
    implicit val enc = Encoders.product[FunnelOut]
    val el = elems.toIndexedSeq
    validateRelaxed(el)
    sortedByKey(ds).mapPartitions { rows =>
      boundedScanPartition(rows) { (events, open, wm) =>
        scanFunnel(events, events.map(_.ts), el, withinMs, open, wm)
      }
    }
  }

  private[graft] def scanFunnel(events: Array[Event], ts: Array[Long],
      elems: IndexedSeq[RelElem], withinMs: Long,
      openEnded: Boolean, wm: Long): (Seq[FunnelOut], Int) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
    val partial = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    var halt = false
    while (i < events.length && !halt) {
      val open = openEnded && wm - ts(i) <= withinMs
      partial.clear()
      tryMatchRelaxed(events, ts, i, elems, withinMs, open, partial) match {
        case (Pending, _) => halt = true
        case (Fail, _) =>
          if (partial.nonEmpty) { // anchored partial: an abandoned funnel
            val e0 = events(partial.head)
            val e1 = events(partial.last)
            out += FunnelOut(e0.key, e0.id, e1.id, e0.ts, e1.ts,
              partial.length, completed = false)
          }
          i += 1
        case (_, idxs) =>
          val e0 = events(idxs.head)
          val e1 = events(idxs.last)
          out += FunnelOut(e0.key, e0.id, e1.id, e0.ts, e1.ts,
            idxs.length, completed = true)
          i += 1 // overlapping: every anchor gets an outcome
      }
    }
    (out.toSeq, i)
  }

  private[graft] def validateRelaxed(elems: IndexedSeq[RelElem]): Unit = {
    if (!elems.exists(_.isInstanceOf[PosElem]))
      throw new IllegalArgumentException("pattern needs at least one positive step")
    elems.lastOption match {
      case Some(ne: NegElem) if !ne.strict =>
        throw new IllegalArgumentException(
          "pattern cannot end with notFollowedBy (no following step bounds the span)")
      case _ =>
    }
  }

  /** Shared relaxed scan (batch + streaming): emit resolved matches,
    * return the resume index for the streaming buffer.
    */
  private[graft] def scanRelaxed(events: Array[Event], ts: Array[Long],
      elems: IndexedSeq[RelElem], withinMs: Long, overlapping: Boolean,
      openEnded: Boolean, wm: Long): (Seq[RMatch], Int) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RMatch]
    var i = 0
    var halt = false
    while (i < events.length && !halt) {
      val open = openEnded && wm - ts(i) <= withinMs
      tryMatchRelaxed(events, ts, i, elems, withinMs, open) match {
        case (Pending, _) => halt = true
        case (Fail, _)    => i += 1
        case (_, idxs)    =>
          val e0 = events(idxs.head)
          val e1 = events(idxs.last)
          out += RMatch(e0.key, e0.id, e1.id, e0.ts, e1.ts, idxs.length)
          i = if (overlapping) i + 1 else idxs.last + 1
      }
    }
    (out.toSeq, i)
  }

  /** Match + per-step MEASURES ([U] flink-table-runtime operators/match/
    * — MEASURES COUNT(B.*), SUM(B.value), FIRST/LAST ids): each match row
    * carries, per pattern step, how many events it consumed, the sum of
    * their `value`s, and the first/last consumed id (0/null-sentinel −1
    * for optional steps that matched zero events).
    */
  case class PMeasures(key: Long, start_id: Long, end_id: Long, n_events: Int,
      step_counts: Seq[Int], step_sums: Seq[Double],
      step_first_id: Seq[Long], step_last_id: Seq[Long])

  /** [[scan]]-shaped measures walk: emit resolved matches with per-step
    * measures, halt at the first anchor whose outcome is still open
    * (openEnded), return the resume index — so it plugs into
    * [[boundedScanPartition]] like the other scans.
    */
  private[graft] def scanMeasures(events: Array[Event], steps: IndexedSeq[Step],
      withinMs: Long, skip: AfterMatch, openEnded: Boolean, wm: Long)
      : (Seq[PMeasures], Int) = {
    val ts = events.map(_.ts)
    val out = scala.collection.mutable.ArrayBuffer.empty[PMeasures]
    var i = 0
    var halt = false
    while (i < events.length && !halt) {
      val open = openEnded && wm - ts(i) <= withinMs
      val takes = new Array[Int](steps.length)
      tryMatchAt(events, ts, i, steps, withinMs, open, takes) match {
        case Pending => halt = true
        case Fail    => i += 1
        case end =>
          var pos = i
          val counts = new Array[Int](steps.length)
          val sums = new Array[Double](steps.length)
          val firsts = Array.fill(steps.length)(-1L)
          val lasts = Array.fill(steps.length)(-1L)
          var si = 0
          while (si < steps.length) {
            counts(si) = takes(si)
            if (takes(si) > 0) {
              firsts(si) = events(pos).id
              lasts(si) = events(pos + takes(si) - 1).id
              var k = 0
              while (k < takes(si)) { sums(si) += events(pos + k).value; k += 1 }
            }
            pos += takes(si)
            si += 1
          }
          out += PMeasures(events(i).key, events(i).id, events(end - 1).id,
            end - i, counts.toSeq, sums.toSeq, firsts.toSeq, lasts.toSeq)
          i = resumeAfter(skip, i, end, steps, takes)
      }
    }
    (out.toSeq, i)
  }

  def matchPatternMeasures(ds: Dataset[Event], steps: Seq[Step], withinMs: Long,
      skip: AfterMatch = SkipPastLastRow): Dataset[PMeasures] = {
    implicit val enc = Encoders.product[PMeasures]
    requireNonIterative(steps)
    val stepsIdx = steps.toIndexedSeq
    sortedByKey(ds).mapPartitions { rows =>
      boundedScanPartition(rows) { (events, open, wm) =>
        scanMeasures(events, stepsIdx, withinMs, skip, open, wm)
      }
    }
  }
}
