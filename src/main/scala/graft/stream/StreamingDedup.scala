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
  * DESIGNED ABSENCE — no streaming KEEPER-policy dedup (the X1a-best
  * [[graft.ext.Dedup.exactDedupKeepBest]] has no `…Stream` form): keep
  * -best needs to RETRACT an already-emitted survivor when a better
  * family member arrives later, and append-mode streaming cannot
  * un-emit (an update-mode formulation would re-emit families
  * per-trigger, pushing the retraction problem onto every downstream
  * consumer). The sound pipeline shape is first-arrival streaming
  * dedup at ingest (bounded state, this file) followed by the BATCH
  * keeper pass over the landed shard before publication
  * ([[graft.ext.Dedup.exactDedupKeepBestAgainst]] — the nightly
  * contract), which is exactly what the X10 funnel composes.
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

  /** Streaming NEAR-dup drop against a frozen history SIGNATURE index —
    * the MinHash half of the nightly-streaming story
    * ([[exactDedupStreamAgainst]] catches byte-identical refetches; this
    * catches documents whose ads/timestamps changed). `historySigs` is
    * the persisted [[graft.ext.Dedup.minhashSignatures]] parquet
    * (keyCol, sig), built with the SAME (n, numHashes, bands, seed) —
    * the band layout cannot diverge by construction, because the
    * per-band join keys below and the index builder's banding share
    * [[graft.ext.Dedup.bandBucket]], one definition. Same refresh
    * caveat as [[exactDedupStreamAgainst]]: the static frame pins its
    * file listing at query start.
    *
    * Shape — built for a stream, correct in batch replay (same code
    * path, no `isStreaming` branch):
    *  - signatures are computed PER ROW ([[graft.ext.Dedup
    *    .minhashSigFromToks]] — the native codegen'd expression form;
    *    no aggregation, so no watermark or state enters); a doc with
    *    fewer than `n` words has a null signature and always survives
    *    (the batch path gives such docs no pair either);
    *  - the ∃-band match is a FOLD of `bands` stream-static LEFT ANTI
    *    joins, one per band: each join's stream-side key
    *    `bandBucket(sig, b)` is a pure-left expression, so every join
    *    is hash-joinable (equi-extractable) — a single join against an
    *    exploded band index would need a mixed-side bucket expression
    *    and degrade to a nested-loop; anti joins never multiply rows,
    *    and chaining them is exactly "survives iff NO band matches";
    *  - each anti join carries the verify predicate
    *    (`sigAgreement ≥ minSim` — the SAME rounded estimate
    *    [[graft.ext.Dedup.minhashPairsAgainst]] filters on) as its
    *    non-equi condition, so a bucket collision alone never drops a
    *    document.
    *
    * Cost note: the static index is scanned once per band per
    * micro-batch (column-pruned: sig + one derived bucket). A
    * production deployment should `persist()` the `historySigs` frame
    * (or let Spark broadcast it when it fits) — the scans are the
    * price of keeping the stream side stateless.
    *
    * Drop-set parity with `minhashPairsAgainst(shard, historySigs,
    * …).select("doc_id_new").distinct()` on the same frames is pinned
    * by StreamingDedupSpec. */
  def minhashDropStreamAgainst(stream: DataFrame, historySigs: DataFrame,
                               textCol: String = "text", n: Int = 3,
                               numHashes: Int = 64, bands: Int = 16,
                               minSim: Double = 0.8, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val withSig = stream
      .withColumn("__toks", split(Dedup.normText(col(textCol)), "\\s+"))
      .withColumn("__sig", Dedup.minhashSigFromToks(col("__toks"), n, numHashes, seed))
      .drop("__toks")
    val survivors = (0 until bands).foldLeft(withSig) { (acc, b) =>
      val hb = historySigs.select(col("sig").as("__hsig"),
        Dedup.bandBucket(col("sig"), b, numHashes, bands).as("__hbucket"))
      acc.join(hb,
        Dedup.bandBucket(col("__sig"), b, numHashes, bands) === col("__hbucket") &&
          Dedup.sigAgreement(col("__sig"), col("__hsig"), numHashes) >= minSim,
        "left_anti")
    }
    survivors.drop("__sig")
  }

  /** The SimHash analog of [[minhashDropStreamAgainst]] — same
    * stream-static per-band anti-join fold, over the persisted
    * [[graft.ext.Dedup.simhashSignatures]] parquet (keyCol, simhash)
    * built with the SAME (n, maxHamming). Band layout shared through
    * [[graft.ext.Dedup.simhashBandBucket]] (one definition with the
    * batch pigeonhole banding); per-row signatures via the native
    * [[graft.functions.SimHashSig]] (no aggregation, no state); each
    * of the `maxHamming + 1` anti joins keys on a pure-left bucket
    * expression and carries the exact Hamming verify
    * (`bit_count(xor) ≤ maxHamming` — [[graft.ext.Dedup
    * .simhashPairsAgainst]]'s filter) as its non-equi condition.
    * Documents with fewer than `n` words have a null signature and
    * always survive. Drop-set parity with `simhashPairsAgainst` is
    * pinned by StreamingDedupSpec. */
  def simhashDropStreamAgainst(stream: DataFrame, historySigs: DataFrame,
                               textCol: String = "text", n: Int = 3,
                               maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val withSig = stream
      .withColumn("__toks", split(Dedup.normText(col(textCol)), "\\s+"))
      .withColumn("__sh", Dedup.simhashSigFromToks(col("__toks"), n))
      .drop("__toks")
    val survivors = (0 to maxHamming).foldLeft(withSig) { (acc, b) =>
      val hb = historySigs.select(col("simhash").as("__hsh"),
        Dedup.simhashBandBucket(col("simhash"), b, maxHamming).as("__hbucket"))
      acc.join(hb,
        Dedup.simhashBandBucket(col("__sh"), b, maxHamming) === col("__hbucket") &&
          bit_count(col("__sh").bitwiseXOR(col("__hsh"))) <= maxHamming,
        "left_anti")
    }
    survivors.drop("__sh")
  }

  /** The EMBEDDING analog of the per-band drop streams — streaming
    * near-duplicate drop against a persisted LSH band index
    * ([[graft.ext.Similarity.lshBands]] output / `saveBands` parquet):
    * each arriving vector computes its band signature PER ROW (one
    * native [[graft.functions.SignBandSignature]] node — no
    * aggregation, no state), and the ∃-band match is the same fold of
    * stream-static LEFT ANTI joins, one per band, each keyed on the
    * pure-left `sig[b]` bucket (hash-joinable) and carrying the EXACT
    * cosine verify (`round(cos, 4) ≥ minSim` — [[graft.ext.Similarity
    * .nearDupPairs]]'s filter) as its non-equi condition, so a bucket
    * collision alone never drops a vector. `historyVecs` supplies the
    * candidate vectors for the verify — the saved corpus the index was
    * built over; rows with null embeddings always survive (null
    * signature, null cosine — the batch path gives them no pair
    * either). The (dim, numBits, bands, seed) params MUST be the saved
    * index's (the `saveBands` params row). */
  def embedDropStreamAgainst(stream: DataFrame, historyBands: DataFrame,
                             historyVecs: DataFrame, minSim: Double = 0.95,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             dim: Int = 64, numBits: Int = 64,
                             bands: Int = 8, seed: Long = 42L): DataFrame = {
    require(numBits % bands == 0,
      s"numBits ($numBits) must be divisible by bands ($bands)")
    val planes = graft.ext.Similarity.hyperplanes(dim, numBits, seed)
    val withSig = stream.withColumn("__sig",
      graft.functions.VectorFunctions.signBands(col(vecCol), planes, bands))
    val survivors = (0 until bands).foldLeft(withSig) { (acc, b) =>
      val hb = historyBands.filter(col("band") === b)
        .select(col("id").as("__hid"), col("bucket").as("__hbucket"))
        .join(historyVecs.select(col(idCol).as("__hid"),
          col(vecCol).as("__hvec")), "__hid")
      acc.join(hb,
        col("__sig").getItem(b) === col("__hbucket") &&
          round(graft.ext.Similarity.cosine(col(vecCol), col("__hvec")), 4)
            >= minSim,
        "left_anti")
    }
    survivors.drop("__sig")
  }

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
