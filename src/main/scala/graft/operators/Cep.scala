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

  /** Detect `a b+ c WITHIN withinMs` per key. */
  def abcWithin(ds: Dataset[Event], a: String, b: String, c: String, withinMs: Long)
      : Dataset[Match] = {
    implicit val matchEnc = Encoders.product[Match]
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroups { (key, it) =>
        val events = it.toArray.sortBy(e => (e.ts, e.id))
        val out = scala.collection.mutable.ArrayBuffer.empty[Match]
        // NFA states: 0 = idle, 1 = saw A, 2 = saw A B+
        var state = 0
        var aEv: Event = null
        var nB = 0
        for (e <- events) {
          val expired = state != 0 && e.ts - aEv.ts > withinMs
          if (expired) { state = 0 }
          (state, e.sym) match {
            case (0, `a`) => aEv = e; nB = 0; state = 1
            case (0, _)   => // idle, ignore
            case (1, `b`) => nB = 1; state = 2
            case (2, `b`) => nB += 1
            case (2, `c`) =>
              out += Match(key, aEv.id, e.id, nB, aEv.ts, e.ts)
              state = 0 // skip past last row
            case (_, `a`) => aEv = e; nB = 0; state = 1 // restart on fresh A
            case _        => state = 0 // strict contiguity: abort
          }
        }
        out.iterator
      }
  }
}
