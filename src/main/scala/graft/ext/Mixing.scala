package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X12 — corpus mixing to a token budget: the step that turns a curated
  * pool into a TRAINING MIX. A pretraining recipe states per-source
  * weights ("50% web, 30% books, 20% code") against a total token
  * budget; this operator measures each source's token supply, derives
  * the per-source document keep rate that hits its share, and samples
  * deterministically at that rate ([[Sampling.bucket]] — the same keyed
  * xor-mixed hash, so the surviving rows are identical across runs,
  * cluster sizes, and engines, and the DuckDB oracle replays the
  * selection exactly).
  *
  * Sources whose supply falls short of their target keep everything
  * (rate caps at 1 — the "epochs > 1 or re-weight" decision is a recipe
  * concern, surfaced in the summary as achieved-vs-target). Sources
  * absent from the weight map get weight 0 and drop entirely.
  *
  * Scale shape (100 TB): the supply census is one partial-agg
  * `groupBy(source)` over a (source, token-count) projection; its result
  * is one row per source (dozens), broadcast back onto the corpus so the
  * keep decision is evaluated map-side in the scan projection — the mix
  * itself costs ZERO shuffles of the corpus. Rates are quantized to
  * 1/10000 ([[Sampling.Buckets]]) with an explicit floor(x·10⁴ + 0.5)
  * so both engines round identically.
  */
object Mixing {

  /** Whitespace token count — DELEGATED to [[TextAnalysis.tokenCount]]
    * so the budget accounting here agrees with the funnel/packing counts
    * it feeds (blank and null text are 0 tokens, not 1/null). */
  def tokenCount(text: Column): Column = TextAnalysis.tokenCount(text)

  /** Per-source supply census: (source, n_docs, tokens_in). */
  def sourceTotals(docs: DataFrame, textCol: String = "text",
                   srcCol: String = "source"): DataFrame =
    docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("tokens_in"))

  /** The per-source plan fragment carrying target and keep threshold:
    * (source, tokens_in, target_tokens, keep_threshold). Targets are
    * literal per-source constants (the recipe), supply is data — so the
    * rate lives in the census frame and reaches the corpus via a
    * broadcast join, never a driver collect. */
  private def rateFrame(docs: DataFrame, textCol: String, srcCol: String,
                        weights: Map[String, Double],
                        totalTokens: Long): DataFrame = {
    require(totalTokens > 0, s"totalTokens ($totalTokens) must be positive")
    require(weights.values.forall(w => w >= 0.0), "weights must be >= 0")
    // Weights are budget SHARES ("50% web, 30% books"): a sum above 1
    // would silently target more than totalTokens across sources.
    require(weights.values.sum <= 1.0 + 1e-9,
      s"weights sum to ${weights.values.sum} — shares of totalTokens must sum to <= 1")
    val target = weights.foldLeft(lit(0L): Column) { case (acc, (src, w)) =>
      when(col("source") === src, lit(math.round(w * totalTokens))).otherwise(acc)
    }
    sourceTotals(docs, textCol, srcCol)
      .withColumn("target_tokens", target)
      .withColumn("keep_threshold", quantizedThreshold)
  }

  /** Keep threshold in [0, 10000] from (target_tokens, tokens_in):
    * explicit floor(x+0.5) so Spark and the SQL oracle round half-up
    * identically. The zero-supply guard is load-bearing: 0/0 is null and
    * Spark's `least` SKIPS nulls, so without it a source whose docs are
    * all blank text (supply 0, target 0) would get threshold 10000 —
    * keep-everything — instead of dropping. */
  private def quantizedThreshold: Column =
    when(col("tokens_in") === 0L, lit(0L)).otherwise(
      floor(least(lit(1.0),
        col("target_tokens") / col("tokens_in")) * 10000 + lit(0.5)).cast("long"))

  /** Temperature-scaled targets: per-source share ∝ supply^alpha — the
    * standard multi-source re-balancing rule (alpha = 1 keeps natural
    * proportions, alpha = 0 is uniform; real multilingual recipes sit
    * around 0.3–0.7 so low-resource sources are up-weighted without
    * flooding epochs). Output: (source, n_docs, tokens_in,
    * target_tokens, keep_threshold) — same shape as the explicit-weight
    * [[mixSummary]] path, so the two recipes share survivor selection.
    *
    * Engine-replay exactness is engineered, not hoped for:
    *  - weights quantize to INTEGER milli-units (floor(supply^α·10³+0.5))
    *    and normalize by their integer sum, so no float summation order
    *    can flip a target (the norm rides a window over the per-source
    *    frame — dozens of rows, bounded by construction);
    *  - at alpha = 0.5 the power is computed as `sqrt`, which IEEE-754
    *    requires correctly rounded — bit-identical across engines —
    *    while general `pow` is only ~1-ulp and carries a (vanishing)
    *    replay risk at target-rounding boundaries;
    *  - `totalTokens · wq` is computed in DOUBLE, so oversized recipes
    *    lose sub-integer precision instead of wrapping: a long multiply
    *    here would overflow at realistic scale (budget 10¹⁰ × a 10¹²-
    *    token source's wq ≈ 10⁹ exceeds 2⁶³). Replay is bit-exact while
    *    the product stays under 2⁵³ (any plausible oracle scale) and
    *    merely approximate — never wrapped — beyond. */
  def temperatureTargets(docs: DataFrame, textCol: String = "text",
                         srcCol: String = "source", alpha: Double,
                         totalTokens: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in [0, 1]")
    require(totalTokens > 0, s"totalTokens ($totalTokens) must be positive")
    val w = if (alpha == 0.5) sqrt(col("tokens_in"))
            else pow(col("tokens_in"), lit(alpha))
    // The weight normalization is a one-row sum over the per-source
    // census, cross-joined (broadcast) back onto it — NOT an
    // unpartitioned window: the empty-partition WindowExec warning it
    // used to emit buried real regressions in bench tails. The census
    // aggregate appears in both branches, so the exchange is reused
    // (one corpus scan), and the broadcast side is a single row.
    val census = sourceTotals(docs, textCol, srcCol)
      .withColumn("__wq", floor(w * 1000 + lit(0.5)).cast("long"))
    census
      .crossJoin(broadcast(census.agg(sum(col("__wq")).as("__wsum"))))
      .withColumn("target_tokens",
        floor(lit(totalTokens).cast("double") * col("__wq")
          / col("__wsum") + lit(0.5)).cast("long"))
      .withColumn("keep_threshold", quantizedThreshold)
      .drop("__wq", "__wsum")
  }

  /** The temperature-mixed corpus (see [[temperatureTargets]]): same
    * zero-corpus-shuffle shape as [[mixToBudget]]. */
  def temperatureMix(docs: DataFrame, textCol: String = "text",
                     keyCol: String = "doc_id", srcCol: String = "source",
                     alpha: Double, totalTokens: Long,
                     seed: Long = 42L): DataFrame =
    mix(docs, keyCol, srcCol, seed,
      temperatureTargets(docs, textCol, srcCol, alpha, totalTokens))

  /** ONE survivor-selection path for both recipe styles — the
    * "identical rows across runs/engines" contract lives here only.
    * The seed is salted with [[Sampling.MixSalt]], so mixing composes
    * independently with sampling/splits at the same seed. */
  private def mix(docs: DataFrame, keyCol: String, srcCol: String,
                  seed: Long, rates: DataFrame): DataFrame = {
    val thresholds = rates.select(col("source").as(srcCol), col("keep_threshold"))
    docs.join(broadcast(thresholds), srcCol)
      .filter(Sampling.bucket(col(keyCol), seed ^ Sampling.MixSalt) <
        col("keep_threshold"))
      .select(docs.columns.toIndexedSeq.map(col): _*)
  }

  /** Recipe audit for the temperature path — the [[mixSummary]] columns
    * driven by [[temperatureTargets]]. */
  def temperatureSummary(docs: DataFrame, textCol: String = "text",
                         keyCol: String = "doc_id", srcCol: String = "source",
                         alpha: Double, totalTokens: Long,
                         seed: Long = 42L): DataFrame =
    summarize(docs, textCol, keyCol, srcCol, seed,
      temperatureTargets(docs, textCol, srcCol, alpha, totalTokens))

  /** The mixed corpus: input columns, filtered to the survivors of the
    * per-source rate. One census aggregate + one broadcast join; the
    * corpus itself never shuffles. */
  def mixToBudget(docs: DataFrame, textCol: String = "text",
                  keyCol: String = "doc_id", srcCol: String = "source",
                  weights: Map[String, Double], totalTokens: Long,
                  seed: Long = 42L): DataFrame =
    mix(docs, keyCol, srcCol, seed,
      rateFrame(docs, textCol, srcCol, weights, totalTokens))

  /** Recipe audit: per source, supply vs target vs achieved — the frame a
    * recipe author reads to decide re-weighting. Two aggregates total
    * (census + achieved), both partial-agg, joined on the tiny source
    * key. Output: (source, n_docs, tokens_in, target_tokens, docs_kept,
    * tokens_kept), ordered. */
  def mixSummary(docs: DataFrame, textCol: String = "text",
                 keyCol: String = "doc_id", srcCol: String = "source",
                 weights: Map[String, Double], totalTokens: Long,
                 seed: Long = 42L): DataFrame =
    summarize(docs, textCol, keyCol, srcCol, seed,
      rateFrame(docs, textCol, srcCol, weights, totalTokens))

  /** Shared audit shape for both recipe styles: achieved docs/tokens per
    * source against the rates frame's targets. */
  private def summarize(docs: DataFrame, textCol: String, keyCol: String,
                        srcCol: String, seed: Long,
                        rates: DataFrame): DataFrame = {
    val kept = docs.join(
        broadcast(rates.select(col("source").as(srcCol), col("keep_threshold"))), srcCol)
      .filter(Sampling.bucket(col(keyCol), seed ^ Sampling.MixSalt) <
        col("keep_threshold"))
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("docs_kept"),
        sum(tokenCount(col(textCol)).cast("long")).as("tokens_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tokens_in"),
        col("target_tokens"),
        coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy("source")
  }

  // ------------------------------------------- weight-aware mixing (X12d)

  /** Weighted per-source supply census: (source, n_docs, utokens_in)
    * where `utokens_in = Σ n_tok · weight_ppm` is the source's supply in
    * MICRO-tokens. This is the consumer of [[Dedup.softDedupWeights]]'
    * `soft_weight_ppm` (X17): a duplicate family of n copies at
    * floor(10⁶/n) ppm each contributes ~one document's mass to the
    * census, so the keep rate is derived against the DEDUPLICATED
    * effective supply, not the raw copy count.
    *
    * All arithmetic is integer: the per-doc product n_tok·w_ppm is exact
    * in long (≤ ~10¹⁰), and the census sum rides DECIMAL(38,0) so a
    * 100 TB source (10¹³ raw tokens → 10¹⁹ micro-tokens) cannot wrap a
    * long before the aggregate finishes. Same partial-agg single-shuffle
    * shape as [[sourceTotals]]. */
  def weightedSourceTotals(docs: DataFrame, textCol: String = "text",
                           srcCol: String = "source",
                           weightCol: String = "soft_weight_ppm"): DataFrame =
    docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((tokenCount(col(textCol)).cast("long") * col(weightCol))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("utokens_in"))

  /** Weighted rate frame: targets stay in TOKENS (the recipe's unit);
    * the threshold compares target·10⁶ against the micro-token supply.
    * The multiply runs in DOUBLE in both engines, left-associated —
    * exact while target < 2⁵³/10⁶, i.e. any plausible budget. */
  private def weightedRateFrame(docs: DataFrame, textCol: String,
                                srcCol: String, weightCol: String,
                                weights: Map[String, Double],
                                totalTokens: Long): DataFrame = {
    require(totalTokens > 0, s"totalTokens ($totalTokens) must be positive")
    require(weights.values.forall(w => w >= 0.0), "weights must be >= 0")
    require(weights.values.sum <= 1.0 + 1e-9,
      s"weights sum to ${weights.values.sum} — shares of totalTokens must sum to <= 1")
    val target = weights.foldLeft(lit(0L): Column) { case (acc, (src, w)) =>
      when(col("source") === src, lit(math.round(w * totalTokens))).otherwise(acc)
    }
    weightedSourceTotals(docs, textCol, srcCol, weightCol)
      .withColumn("target_tokens", target)
      .withColumn("keep_threshold",
        when(col("utokens_in") === 0, lit(0L)).otherwise(
          floor(least(lit(1.0),
            col("target_tokens").cast("double") * lit(1000000.0)
              / col("utokens_in").cast("double")) * 10000 + lit(0.5))
            .cast("long")))
  }

  /** Weighted survivor selection: each doc keeps with probability
    * (keep_threshold/10⁴)·(weight_ppm/10⁶), decided as the EXACT integer
    * comparison `bucket·10⁶ < threshold·weight_ppm` (≤ 10¹⁰ — no float
    * anywhere, so the DuckDB oracle replays the selection bit-for-bit).
    * At weight 10⁶ this degenerates to the unweighted [[mixToBudget]]
    * predicate. A soft-dedup family of n copies each at ~10⁶/n ppm thus
    * keeps rate·(1/n) of each copy — in expectation, one document's
    * worth of the family survives per unit rate, the SoftDedup paper's
    * composition. */
  private def weightedKeep(keyCol: String, weightCol: String,
                           seed: Long): Column =
    Sampling.bucket(col(keyCol), seed ^ Sampling.MixSalt) * lit(1000000L) <
      col("keep_threshold") * col(weightCol)

  /** The weight-aware mixed corpus: input columns, filtered to weighted
    * survivors. Same zero-corpus-shuffle shape as [[mixToBudget]] (one
    * census aggregate + one broadcast join). */
  def weightedMixToBudget(docs: DataFrame, textCol: String = "text",
                          keyCol: String = "doc_id", srcCol: String = "source",
                          weightCol: String = "soft_weight_ppm",
                          weights: Map[String, Double], totalTokens: Long,
                          seed: Long = 42L): DataFrame = {
    val rates = weightedRateFrame(docs, textCol, srcCol, weightCol, weights, totalTokens)
    docs.join(broadcast(
        rates.select(col("source").as(srcCol), col("keep_threshold"))), srcCol)
      .filter(weightedKeep(keyCol, weightCol, seed))
      .select(docs.columns.toIndexedSeq.map(col): _*)
  }

  /** Weighted recipe audit: (source, n_docs, utokens_in, target_tokens,
    * docs_kept, utokens_kept) — supply and achieved mass in micro-tokens,
    * so "a duplicate family carries ~one doc of mass" is readable
    * directly from the audit. */
  def weightedMixSummary(docs: DataFrame, textCol: String = "text",
                         keyCol: String = "doc_id", srcCol: String = "source",
                         weightCol: String = "soft_weight_ppm",
                         weights: Map[String, Double], totalTokens: Long,
                         seed: Long = 42L): DataFrame = {
    val rates = weightedRateFrame(docs, textCol, srcCol, weightCol, weights, totalTokens)
    val kept = docs.join(broadcast(
        rates.select(col("source").as(srcCol), col("keep_threshold"))), srcCol)
      .filter(weightedKeep(keyCol, weightCol, seed))
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("docs_kept"),
        sum((tokenCount(col(textCol)).cast("long") * col(weightCol))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("utokens_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        col("utokens_in").cast("long").as("utokens_in"),
        col("target_tokens"),
        coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
        coalesce(col("utokens_kept").cast("long"), lit(0L)).as("utokens_kept"))
      .orderBy("source")
  }

  /** Salt for the fractional-epoch keep draw ("EPOC") — decorrelated
    * from every sampling/mix/order stage like the [[Sampling]] salts. */
  val EpochSalt = 0x45504F43L

  /** Copies-per-key modulus for the per-copy order key: bounds
    * `epochs ≤ 1024` so `key·1024 + epoch_idx` stays injective (and
    * < 2⁶² for any 2⁵¹-bounded key) before [[Sampling.orderKey]]. */
  val MaxEpochs = 1024L

  /** X12d — PHYSICAL multi-epoch upsampling (the published-recipe step
    * between the mix plan and the packed corpus: LLM data recipes
    * state per-source repeat factors — "Wikipedia 3.0 epochs, web 0.8"
    * — and the training corpus materializes them): every document of
    * source s emits `floor(f_s)` copies plus one more iff its keyed
    * hash clears the fractional part (`pmod(hash64, 10⁶) <
    * f_s mod 10⁶` — so a 2.3-epoch source repeats every document
    * twice and a deterministic, partitioning-invariant 30% of them a
    * third time; expected mass = f_s exactly). Factors are in ppm
    * (2_300_000 = 2.3 epochs); `f = 0` drops the source.
    *
    * Each copy carries `epoch_idx` (0-based) and its OWN
    * `shuffle_key` — [[Sampling.orderKey]] of `key·1024 + epoch_idx`,
    * so the copies of one document SCATTER across the global training
    * order instead of training back-to-back (the reason epoch
    * expansion happens before the corpus shuffle, not after).
    *
    * Scale shape: map-only — the factor is a when-chain literal, the
    * keep draw a per-row hash, the expansion one `explode(sequence)`
    * per row (bounded by `MaxEpochs`); no shuffle, no census, output
    * rows = Σ f_s·|s|. Integer end to end (`div`/`pmod` on ppm), so
    * WHICH copies exist replays exactly in SQL. */
  def upsample(docs: DataFrame, factorsPpm: Map[String, Long],
               defaultPpm: Long = 1000000L, srcCol: String = "source",
               keyCol: String = "doc_id", seed: Long = 42L): DataFrame = {
    val all = factorsPpm.values ++ Seq(defaultPpm)
    require(all.forall(p => p >= 0L && p <= MaxEpochs * 1000000L),
      s"factors must be in [0, ${MaxEpochs}e6] ppm")
    val f = factorsPpm.toSeq.sortBy(_._1).foldLeft(lit(defaultPpm): Column) {
      case (acc, (s, p)) => when(col(srcCol) === s, lit(p)).otherwise(acc)
    }
    docs
      .withColumn("__fppm", f)
      .withColumn("__n",
        expr("__fppm div 1000000") +
          when(pmod(Sampling.hash64(col(keyCol), seed ^ EpochSalt),
            lit(1000000L)) < expr("__fppm % 1000000"), 1L).otherwise(0L))
      .filter(col("__n") >= 1L)
      .withColumn("epoch_idx", explode(sequence(lit(0L), col("__n") - 1)))
      .withColumn("shuffle_key",
        Sampling.orderKey(col(keyCol) * lit(MaxEpochs) + col("epoch_idx"),
          seed ^ Sampling.OrderSalt))
      .drop("__fppm", "__n")
  }

  /** Deterministic global training order: documents reordered by a keyed
    * hash (shuffle-the-corpus-once, the step between mixing and
    * [[Packing]]). The sort key is the FULL-WIDTH engine-replayable
    * ORDER-grade mix ([[Sampling.orderKey]], ~2⁶² distinct values,
    * [[Sampling.OrderSalt]]-salted) — not the 10⁴-valued bucket, whose
    * huge tie groups would leave each group's documents in original id
    * order, and not raw [[Sampling.hash64]], whose no-wrap low lane is
    * order-preserving in the key: sorting dense ids by it kept ~92% of
    * adjacent id pairs adjacent (measured — same-crawl documents glued
    * together in every batch, a shuffle in name only; the wrap-mix
    * drops that to ~2×10⁻⁵, pinned in MixingSpec). doc_id stays as the
    * final tiebreak only. Spark executes it as a range-partitioned
    * sort — no single-reducer bottleneck at any corpus size. */
  def trainingOrder(docs: DataFrame, keyCol: String = "doc_id",
                    seed: Long = 42L): DataFrame =
    docs.withColumn("shuffle_key",
        Sampling.orderKey(col(keyCol), seed ^ Sampling.OrderSalt))
      .orderBy(col("shuffle_key"), col(keyCol))
}
