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
      f: (I, ExecutionContext) => Future[O]): Dataset[O] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
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
  }

  /** Unordered async map — Flink's unorderedWait: results emit in
    * COMPLETION order and the in-flight window refills continuously, so
    * one slow call never head-of-line-blocks the other capacity−1 slots
    * (a wave-barrier shape would degrade to the slowest call per wave).
    */
  def mapUnordered[I, O: Encoder](ds: Dataset[I], capacity: Int, timeout: Duration)(
      f: (I, ExecutionContext) => Future[O]): Dataset[O] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    ds.mapPartitions { it =>
      val pool = poolFor(capacity)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val done = new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, O]]()
      new Iterator[O] {
        private var inFlight = 0 // consumer-thread only
        private def fill(): Unit =
          while (inFlight < capacity && it.hasNext) {
            inFlight += 1
            f(it.next(), ec).onComplete {
              case scala.util.Success(v) => done.put(Right(v))
              case scala.util.Failure(e) => done.put(Left(e))
            }
          }
        def hasNext: Boolean = {
          fill()
          if (inFlight == 0) { pool.shutdown(); false } else true
        }
        def next(): O = {
          fill()
          val r = done.poll(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (r == null) {
            pool.shutdownNow()
            throw new java.util.concurrent.TimeoutException(
              s"async I/O result not ready within $timeout")
          }
          inFlight -= 1
          r match {
            case Right(v) => v
            case Left(e) => pool.shutdownNow(); throw e
          }
        }
      }
    }
  }
}
