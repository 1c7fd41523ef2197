package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import java.util.concurrent.Executors

/** Cached async lookup join — the reference's async dimension lookup with
  * an LRU/TTL cache in front of the external call
  * ([U] flink-table-runtime operators/join/lookup/AsyncLookupJoinRunner
  * .java + table/connector lookup cache). Composes the [[AsyncIO]]
  * bounded-in-flight pattern with a per-partition cache: each partition
  * keeps at most `cacheMax` (key → value) entries for `cacheTtlMs`;
  * cache hits complete synchronously, misses go through the async fetch
  * with up to `capacity` in flight. At scale the effective lookup rate on
  * the dimension store drops from rows/s to distinct-keys/s per
  * partition — the exact reason the reference ships the cache.
  */
object AsyncLookup {

  /** Ordered cached async lookup: one output per input, input order kept.
    * `fetch` is invoked only on cache misses.
    */
  def mapCached[I, K, V, O: Encoder](ds: Dataset[I], capacity: Int, timeout: Duration,
      cacheMax: Int, cacheTtlMs: Long)(
      keyOf: I => K)(fetch: (K, ExecutionContext) => Future[V])(
      combine: (I, V) => O): Dataset[O] =
    ds.mapPartitions { it =>
      val pool = Executors.newFixedThreadPool(capacity)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // insertion-ordered map → LRU-ish eviction of the oldest entry
      val cache = new java.util.LinkedHashMap[K, (V, Long)](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, (V, Long)]): Boolean =
          size() > cacheMax
      }
      def cached(k: K): Option[V] = cache.synchronized {
        val e = cache.get(k)
        if (e == null) None
        else if (System.currentTimeMillis() - e._2 > cacheTtlMs) { cache.remove(k); None }
        else Some(e._1)
      }
      val inFlight = scala.collection.mutable.Queue.empty[(I, Either[V, Future[V]])]
      // one pending fetch per key: a burst of the same key shares the
      // in-flight future instead of firing duplicate remote calls
      val pending = scala.collection.mutable.Map.empty[K, Future[V]]
      def fill(): Unit =
        while (inFlight.size < capacity && it.hasNext) {
          val i = it.next()
          val k = keyOf(i)
          cached(k) match {
            case Some(v) => inFlight.enqueue((i, Left(v)))
            case None =>
              val f = pending.synchronized {
                pending.getOrElseUpdate(k, {
                  val nf = fetch(k, ec)
                  nf.foreach { v =>
                    cache.synchronized { cache.put(k, (v, System.currentTimeMillis())) }
                    pending.synchronized { pending.remove(k) }
                  }
                  nf
                })
              }
              inFlight.enqueue((i, Right(f)))
          }
        }
      new Iterator[O] {
        def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        def next(): O = {
          fill()
          val (i, r) = inFlight.dequeue()
          combine(i, r.fold(identity, f => Await.result(f, timeout)))
        }
      }
    }
}
