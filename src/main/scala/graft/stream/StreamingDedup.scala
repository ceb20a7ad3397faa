package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Streaming exact deduplication — the streaming counterpart of
  * [[graft.ext.Dedup.exactDedup]] for continuously-ingested corpora
  * (SURVEY.md §2.8 streaming mode; the batch-only reference has no
  * counterpart).
  *
  * Scale design:
  *  - the dedup key is a 128-bit md5 of the NORMALIZED text (case-folded,
  *    whitespace-collapsed — same canonicalization as the batch path), so
  *    per-key state is 16 bytes, never the document body;
  *  - `dropDuplicatesWithinWatermark` bounds the state: keys older than
  *    the watermark horizon are evicted, so state size is
  *    O(unique docs per horizon), not O(stream history). A duplicate
  *    arriving AFTER its original's key was evicted is re-admitted —
  *    the documented trade-off of horizon-bounded streaming dedup (an
  *    exact-forever dedup needs an external key store);
  *  - first arrival wins within the horizon; output rows keep the full
  *    input schema.
  *
  * The same transformation runs in batch (watermark is a no-op there and
  * the dedup degenerates to plain per-key dedup), which is what the
  * registered batch-replay query exercises against the DuckDB oracle.
  */
object StreamingDedup {

  /** The shared stateful tail of both dedup paths: watermark +
    * within-horizon drop on the already-keyed frame (batch degenerates
    * to plain per-key dedup — Spark rejects
    * `dropDuplicatesWithinWatermark` outside streaming, where the
    * watermark would be a no-op anyway). ONE definition so the plain
    * and history-index paths cannot diverge. */
  private def dedupKeyed(keyed: DataFrame, tsCol: String,
                         watermarkDelay: String): DataFrame = {
    val deduped =
      if (keyed.isStreaming)
        keyed.withWatermark(tsCol, watermarkDelay)
          .dropDuplicatesWithinWatermark("__fp")
      else keyed.dropDuplicates("__fp")
    deduped.drop("__fp")
  }

  /** Drop near-arrival duplicates of the normalized `textCol`. The input
    * must carry the event-time column `tsCol` for the watermark. */
  def exactDedupStream(stream: DataFrame, tsCol: String,
                       textCol: String = "text",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    dedupKeyed(
      stream.withColumn("__fp", Dedup.fingerprintOf(col(textCol))),
      tsCol, watermarkDelay)

  /** Streaming dedup AGAINST A FROZEN HISTORY INDEX — the streaming
    * counterpart of [[graft.ext.Dedup.exactDedupAgainst]], closing the
    * horizon-eviction gap: `dropDuplicatesWithinWatermark` forgets a key
    * once the watermark passes it, but a duplicate of LAST MONTH's
    * corpus should still drop. `historyFp` is the persisted
    * [[graft.ext.Dedup.fingerprints]] parquet, joined as a stream-static
    * anti join. REFRESH CAVEAT: a plain `spark.read.parquet(path)` frame
    * pins its FILE LISTING when the DataFrame is created — files a
    * nightly job adds later are invisible to the running query, and an
    * overwrite that deletes listed files fails micro-batches with
    * FileNotFoundException. To pick up a refreshed index, restart the
    * query (or the stream) against a re-created static frame, or read
    * the index through a catalog table and `REFRESH TABLE` it — the
    * streaming state checkpoint survives the restart, so this is a
    * planned-rollover concern, not data loss.
    *
    * The anti join runs BEFORE the stateful dedup, so history-known keys
    * never even enter the state store — state stays
    * O(unique NEW docs per horizon). First arrival wins within the
    * horizon; a NEW document's re-arrival after eviction is re-admitted
    * (the documented horizon trade-off, now scoped to genuinely new
    * content only). */
  def exactDedupStreamAgainst(stream: DataFrame, historyFp: DataFrame,
                              tsCol: String, textCol: String = "text",
                              watermarkDelay: String = "10 minutes"): DataFrame =
    dedupKeyed(
      stream.withColumn("__fp", Dedup.fingerprintOf(col(textCol)))
        .join(historyFp.select(col("fp").as("__fp")), Seq("__fp"), "left_anti"),
      tsCol, watermarkDelay)

  /** Deterministic dedup summary of a (replayed) stream: input rows,
    * surviving unique rows, duplicates dropped. After the dedup each key
    * has multiplicity exactly 1, so the counts are order-independent even
    * though WHICH duplicate survives is not. */
  def dedupSummary(stream: DataFrame, tsCol: String,
                   textCol: String = "text",
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    // Batch-replay audit only: two aggregations + a crossJoin are
    // unsupported in structured streaming — fail at construction with a
    // real message rather than at writeStream.start().
    require(!stream.isStreaming,
      "dedupSummary is a batch-replay audit; for a live stream, count " +
        "exactDedupStream's output per micro-batch in foreachBatch")
    val deduped = exactDedupStream(stream, tsCol, textCol, watermarkDelay)
      .agg(count(lit(1)).as("n_unique"))
    stream.agg(count(lit(1)).as("n_docs"))
      .crossJoin(deduped)
      .select(col("n_docs"), col("n_unique"),
        (col("n_docs") - col("n_unique")).as("n_dups"))
  }
}
