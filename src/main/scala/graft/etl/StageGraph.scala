package graft.etl

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.DataFrame

/** Deterministic in-process stage graph — the engine's counterpart of the
  * reference's ETL DAG semantics (Glue-etl-pipeline.py):
  *
  *  - P1 named batch jobs (`:64-111`) → named stage functions over the
  *    outputs of their dependencies;
  *  - P2 diamond dependency / fan-in barrier (`:125-129`) → topological
  *    execution; a stage runs only after all of its inputs completed.
  *    Spark's lazy DAG preserves the barrier at the data level too: a
  *    stage reading three upstream DataFrames depends on all three;
  *  - P3 blocking completion wait (`wait_for_completion=True`, `:69`) →
  *    Spark actions are synchronous, no sleep needed;
  *  - P4 retry policy (`retries: 1`, `:54-55`) → per-stage bounded retry;
  *    stages marked `retries = 0` (alert emitters,
  *    pager-workflow.py:320) are never re-run.
  *
  * Retry semantics and laziness: by default (`eager = false`) stage
  * functions only BUILD DataFrames — Catalyst fuses the whole graph into
  * one plan and nothing executes until a downstream action, so retry
  * covers construction-time failures only (missing input, bad column).
  * That fusion is deliberately better than the reference's
  * materialize-every-Glue-job design. With `eager = true` each stage is
  * materialized (`localCheckpoint`) inside its retry envelope — the
  * reference's per-job durability semantics: a runtime failure in stage N
  * is retried without re-running stages < N, at the cost of
  * checkpointing every intermediate.
  */
final case class Stage(
    name: String,
    deps: Seq[String],
    retries: Int = 1)(
    val fn: Map[String, DataFrame] => DataFrame)

final class StageGraphException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

final case class StageGraph(stages: Seq[Stage], eager: Boolean = false) {
  private val byName = stages.map(s => s.name -> s).toMap
  require(byName.size == stages.size, "duplicate stage names")
  stages.foreach(s => s.deps.foreach(d =>
    require(byName.contains(d), s"stage ${s.name} depends on unknown stage $d")))

  /** Deterministic topological order (stable within a rank: declaration
    * order) — derived from [[ranks]], one traversal to maintain. */
  lazy val topoOrder: Seq[String] = ranks.flatten

  /** Topological ranks: every stage in rank i depends only on stages in
    * ranks < i — stages within a rank are mutually independent. */
  lazy val ranks: Seq[Seq[String]] = {
    @tailrec def go(done: Set[String], acc: Vector[Seq[String]],
                    remaining: Seq[Stage]): Vector[Seq[String]] =
      if (remaining.isEmpty) acc
      else {
        val (ready, blocked) = remaining.partition(_.deps.forall(done.contains))
        if (ready.isEmpty)
          throw new StageGraphException(
            s"cycle among stages: ${blocked.map(_.name).mkString(", ")}")
        go(done ++ ready.map(_.name), acc :+ ready.map(_.name), blocked)
      }
    go(Set.empty, Vector.empty, stages)
  }

  /** Execute all stages; returns every stage's output by name.
    *
    * Eager mode materializes each rank's stages CONCURRENTLY — the
    * reference's diamond runs its three independent Glue jobs in
    * parallel (Glue-etl-pipeline.py:125-129), and concurrent Spark
    * actions on one session schedule as parallel jobs. Lazy mode stays
    * sequential: stage functions only build plans there, so parallelism
    * would buy nothing (Catalyst fuses the whole graph anyway). */
  def run(inputs: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] =
    if (!eager)
      topoOrder.foldLeft(inputs) { (acc, name) =>
        val stage = byName(name)
        acc + (name -> runWithRetry(stage, acc, stage.retries))
      }
    else
      // Each rank's blocking materializations run on a dedicated pool
      // (not the global EC) and ALL rank failures surface together — see
      // graft.suite.Concurrency.
      ranks.foldLeft(inputs) { (acc, rank) =>
        acc ++ graft.suite.Concurrency.all(rank) { name =>
          val stage = byName(name)
          name -> runWithRetry(stage, acc, stage.retries)
        }
      }

  @tailrec
  private def runWithRetry(
      stage: Stage, acc: Map[String, DataFrame], attemptsLeft: Int): DataFrame =
    Try {
      val df = stage.fn(acc)
      // Eager mode: force execution inside the retry envelope (and truncate
      // lineage) so runtime failures — not just plan-construction failures —
      // are what the retry policy actually retries.
      if (eager) df.localCheckpoint(true) else df
    } match {
      case Success(df) => df
      case Failure(e) if attemptsLeft > 0 => runWithRetry(stage, acc, attemptsLeft - 1)
      case Failure(e) =>
        throw new StageGraphException(s"stage ${stage.name} failed", e)
    }
}
