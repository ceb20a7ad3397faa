package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.Scd2

/** S7 — streaming SCD-2 dimension maintenance: [[graft.etl.Scd2
  * .snapshot]] applied per micro-batch of update rows via
  * `foreachBatch` (SURVEY.md §2.8 streaming mode; completes the
  * batch/stream story the other six lanes follow — same operator, same
  * oracle, replayed on a static frame for the correctness gate).
  *
  * Semantics: each micro-batch is one dbt-style snapshot run against
  * the CURRENT dimension state — changed keys close + re-insert at the
  * batch's effective timestamp, unreported keys stay open, new keys
  * insert. Because [[Scd2.snapshot]] leaves keys absent from the
  * update batch untouched, applying a KEY-PARTITIONED update set as N
  * sequential batches at one effective `ts` composes to exactly the
  * one-shot merge — the batch-replay parity the registered query
  * hash-checks against the T4 oracle, and the live-stream parity
  * StreamingScd2Spec pins over a real MemoryStream.
  *
  * State: the dimension itself. In production the sink is a
  * transactional table (Delta/Iceberg MERGE, or a rewritten parquet
  * snapshot dir per batch — the [[graft.suite.Checkpoint]] v6
  * discipline); here the state is held as a DataFrame pinned per batch
  * with `localCheckpoint`, which both materializes the merge (the
  * next batch's full-outer join reads a table, not a growing lineage
  * chain — N batches would otherwise replay N nested merges) and
  * stands in for the transactional swap. `foreachBatch` gives
  * at-least-once sink semantics; [[Scd2.snapshot]] is IDEMPOTENT for a
  * replayed batch at the same `ts` (unchanged rows stay open, a
  * re-applied change matches the already-inserted open version), so
  * replays converge — the standard foreachBatch-upsert contract.
  *
  * 100 TB shape, per batch: one full-outer join shuffled on the
  * business key between the OPEN slice and the (small) micro-batch;
  * closed history is union pass-through and never shuffles. The
  * duplicate-key precondition of [[Scd2.snapshot]] applies per batch —
  * dedupe the batch on the key first if the source can repeat keys
  * within one trigger interval.
  */
object StreamingScd2 {

  /** The mutable dimension holder the foreachBatch sink upserts into —
    * the in-session stand-in for a transactional table. Reads
    * ([[current]]) always see a fully-merged snapshot (the reference
    * swaps only after the batch's merge materialized). */
  final class DimState(initial: DataFrame) {
    @volatile private var state: DataFrame = initial.localCheckpoint(true)
    def current: DataFrame = state
    private[stream] def swap(next: DataFrame): Unit = state = next
  }

  /** Apply ONE update micro-batch to the dimension state — the
    * foreachBatch body, also the batch-replay unit the registered
    * query drives directly (same code path, no isStreaming branch). */
  def upsertBatch(state: DimState, batch: DataFrame,
                  keys: Seq[String], tracked: Seq[String],
                  ts: Column): Unit =
    state.swap(
      Scd2.snapshot(state.current, batch, keys, tracked, ts)
        .localCheckpoint(true))

  /** Start the streaming upsert: every micro-batch of `updates` merges
    * into `state` at the effective timestamp `tsOf(batchId)` (a
    * constant column for calendar-stamped runs, or derived from the
    * batch id for testable determinism). */
  def run(updates: DataFrame, state: DimState,
          keys: Seq[String], tracked: Seq[String],
          tsOf: Long => Column,
          queryName: String = "graft-streaming-scd2",
          checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = updates.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(state, batch, keys, tracked, tsOf(batchId))
      }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
