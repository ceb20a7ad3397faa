package graft.suite

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future, blocking}
import scala.util.{Failure, Success, Try}

/** Shared helper for running blocking Spark actions concurrently
  * (per-table validation suites, eager stage-graph ranks).
  *
  * Why not `ExecutionContext.Implicits.global`: these tasks BLOCK on
  * Spark actions, and parking them on the bounded shared pool starves
  * whatever else uses it. Each batch gets its own pool sized to the
  * batch (capped), wrapped in `blocking`, and shut down when done.
  */
private[graft] object Concurrency {

  /** Run `f` over every item concurrently; return results in input
    * order. If ANY task fails, every failure is surfaced: the first
    * exception is thrown with the others attached as suppressed —
    * awaiting sequentially would report only the first and discard its
    * siblings (the remaining tasks still run to completion; Spark
    * actions are not cancellable mid-job anyway). */
  def all[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.isEmpty) return Nil
    if (items.size == 1) return Seq(f(items.head))
    val pool = Executors.newFixedThreadPool(math.min(items.size, 16))
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futures = items.map(a => Future(blocking(f(a))))
      val results = futures.map(fu => Try(Await.result(fu, Duration.Inf)))
      val failures = results.collect { case Failure(e) => e }
      if (failures.nonEmpty) {
        val first = failures.head
        failures.tail.foreach { e =>
          if (e ne first) first.addSuppressed(e)
        }
        throw first
      }
      results.collect { case Success(b) => b }
    } finally pool.shutdown()
  }
}
