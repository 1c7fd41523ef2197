package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}

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
  * Execution: flatMapGroups with an in-memory sort per key — the batch
  * analog of Flink's ordered ListState buffer + NFA. State is bounded by
  * one key's events (a user's history), which is the same bound Flink's
  * CEP buffer carries; keys are processed independently and distributed
  * by the groupBy shuffle, so the operator scales with executors.
  */
object Cep {

  case class Event(key: Long, id: Long, ts: Long, sym: String)
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

  /** Detect `a b+ c WITHIN withinMs` per key (batch: in-memory sort per
    * key, the analog of Flink's ordered ListState buffer).
    */
  def abcWithin(ds: Dataset[Event], a: String, b: String, c: String, withinMs: Long)
      : Dataset[Match] = {
    implicit val matchEnc = Encoders.product[Match]
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroups { (_, it) =>
        val events = it.toArray.sortBy(e => (e.ts, e.id))
        val out = scala.collection.mutable.ArrayBuffer.empty[Match]
        var s = idle
        for (e <- events) {
          val (ns, m) = step(s, e, a, b, c, withinMs)
          s = ns
          m.foreach(out += _)
        }
        out.iterator
      }
  }
}
