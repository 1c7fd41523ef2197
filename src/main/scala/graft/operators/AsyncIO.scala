package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import java.util.concurrent.Executors

/** Async I/O — the reference's `AsyncDataStream.unorderedWait/orderedWait`
  * ([U] flink-streaming-java api/datastream/AsyncDataStream.java; also the
  * 1.19 FLIP-400 AsyncScalarFunction). Spark has no async operator, so this
  * is the documented mapPartitions + bounded-Future-pool helper
  * (SURVEY.md §2.2 "async I/O"): up to `capacity` in-flight calls per
  * partition, results respecting (ordered) or ignoring (unordered) input
  * order. Parallelism is per-partition — at scale total in-flight =
  * capacity × partitions, the same knob Flink exposes.
  */
object AsyncIO {

  /** Ordered async map: output order = input order (Flink orderedWait),
    * with a per-partition thread pool.
    */
  /** The pool must not rely on full iterator drain for shutdown: a
    * downstream limit/early-exit or an Await timeout abandons the
    * iterator, so cleanup is tied to task completion.
    */
  private def poolFor(capacity: Int): java.util.concurrent.ExecutorService = {
    val pool = Executors.newFixedThreadPool(capacity)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
    pool
  }

  def mapOrdered[I, O: Encoder](ds: Dataset[I], capacity: Int, timeout: Duration)(
      f: (I, ExecutionContext) => Future[O]): Dataset[O] =
    ds.mapPartitions { it =>
      val pool = poolFor(capacity)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // sliding window of `capacity` in-flight futures, emitted in order
      new Iterator[O] {
        private val inFlight = scala.collection.mutable.Queue.empty[Future[O]]
        private def fill(): Unit =
          while (inFlight.size < capacity && it.hasNext) inFlight.enqueue(f(it.next(), ec))
        def hasNext: Boolean = { fill(); if (inFlight.isEmpty) { pool.shutdown(); false } else true }
        def next(): O = { fill(); Await.result(inFlight.dequeue(), timeout) }
      }
    }

  /** Unordered async map: results emitted as they complete within each
    * capacity-sized wave (Flink unorderedWait relaxation).
    */
  def mapUnordered[I, O: Encoder](ds: Dataset[I], capacity: Int, timeout: Duration)(
      f: (I, ExecutionContext) => Future[O]): Dataset[O] =
    ds.mapPartitions { it =>
      val pool = poolFor(capacity)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val out = it.grouped(capacity).flatMap { wave =>
        val fs = wave.map(i => f(i, ec))
        fs.map(fu => Await.result(fu, timeout))
      }
      new Iterator[O] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) pool.shutdown(); h }
        def next(): O = out.next()
      }
    }
}
