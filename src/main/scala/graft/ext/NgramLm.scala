package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X15 — bigram language-model perplexity scoring: the CCNet-style
  * "how close is this document to a trusted reference corpus" gate
  * (public pipelines score crawl text against a Wikipedia-trained
  * KenLM and keep the low-perplexity head; the engine's job is the
  * train/score/band plumbing at corpus scale — the reference corpus is
  * a parameter).
  *
  * The model is STUPID BACKOFF over word bigrams (Brants et al. 2007 —
  * no discounting, a fixed backoff factor, the standard web-scale
  * choice because training is two pure counting aggregates):
  *
  *   p(w2 | w1) = c(w1 w2) / c(w1)                    if c(w1 w2) > 0
  *              = 0.4 * (c(w2) + 1) / (total + V)     otherwise
  *
  * (+1/+V Laplace mass so out-of-vocabulary words score finitely).
  *
  * Float discipline (the x4 z-score / Gopher cross-multiply house
  * rule, adapted — a sum of logs cannot be decimal-exact): each gram's
  * log-probability is rounded ONCE to integer MICRO-NATS,
  * `round(1e6 * ln p)`, and everything downstream — the per-document
  * sum, the band cut — is exact 64-bit integer arithmetic, so
  * aggregation order can never perturb a hash. |ln p| < 40 for any
  * count model, so a document needs > 2^63/4e7 ≈ 2×10¹¹ grams to
  * overflow — unreachable (ANSI mode throws loudly anyway). The band
  * cut is an integer cross-multiply: head iff
  * `sum_micro >= headMicro * n_grams` (thresholds are per-gram
  * micro-nats; ppl 100 ≈ -4 605 170). The reported `lm_ppl` is derived
  * FROM the integer sum (`exp(-sum/1e6/n)`, rounded to 3 dp) — display
  * only, never compared.
  *
  * 100 TB shape: training is two `groupBy.count` passes over the
  * (bounded, trusted) reference corpus — partial-agg, map-side
  * combine. Scoring pre-aggregates the probe side per
  * `(doc, w1, w2)` BEFORE touching the model, so a hot bigram ("of
  * the") contributes one row per document, not one per occurrence —
  * the join-key skew cap — then equi-joins the three count tables
  * (one row per key on the build side; Spark auto-broadcasts when the
  * model is small, sort-merge when it is not) and reduces back to one
  * row per document. The totals frame is one row, joined by a
  * broadcast cross join (the Mixing discipline — no driver collect).
  */
object NgramLm {

  /** ln(0.4) in micro-nats — the stupid-backoff factor, rounded once
    * HERE so the Scala plan and any SQL replay share the exact integer
    * (one definition; -916291 = round(1e6 * ln 0.4)). */
  val BackoffMicro: Long = -916291L

  /** Default band cuts, per-gram micro-nats (avg log-prob): head ≈
    * ppl 100 (-1e6·ln 100), tail ≈ ppl 1000 (-1e6·ln 1000). Named so
    * the [[scored]] defaults and any SQL replay share the exact
    * integers (the [[BackoffMicro]] one-definition rule). */
  val HeadMicro: Long = -4605170L
  val TailMicro: Long = -6907755L

  /** A trained model: pure count frames, each persistable as parquet
    * and re-loadable — the incremental-dedup history-index discipline
    * ([[Dedup.fingerprints]]) applied to LM counts. `trigrams` present
    * iff the model was trained at order 3 (the CCNet-style filter's
    * real LM is higher-order; [[scored]] dispatches on it, so a
    * pipeline swaps orders by retraining — no call-site change). */
  final case class Model(
      bigrams: DataFrame,  // (w1, w2, c2: Long) — one row per seen bigram
      unigrams: DataFrame, // (w, c1: Long) — one row per seen word
      totals: DataFrame,   // ONE row: (total_toks: Long, vocab: Long)
      trigrams: Option[DataFrame] = None) { // (w1, w2, w3, c3: Long)

    /** Pin the count frames ([[org.apache.spark.sql.Dataset.localCheckpoint]]) —
      * the persisted-index contract of the streaming dedup paths
      * ([[graft.Queries.s3StreamNeardup]]): in production the model is
      * SAVED parquet read back once; a derived frame would re-run the
      * reference-corpus tokenize+aggregate for every join build that
      * consumes it ([[scored]] consumes the unigram table twice). */
    def materialize(): Model = Model(
      bigrams.localCheckpoint(true),
      unigrams.localCheckpoint(true),
      totals.localCheckpoint(true),
      trigrams.map(_.localCheckpoint(true)))
  }

  /** Persist a trained model to parquet — the [[graft.ext.IvfIndex
    * .save]] discipline for LM counts: the nightly pipeline trains on
    * the trusted reference ONCE and every later scoring run loads the
    * counts without re-tokenizing the reference corpus. */
  def save(model: Model, dir: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    model.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    model.totals.coalesce(1).write.mode("overwrite").parquet(s"$dir/totals")
    model.trigrams.foreach(
      _.write.mode("overwrite").parquet(s"$dir/trigrams"))
  }

  /** Load a saved model. The count frames stay distributed (backed by
    * the saved parquet — nothing reaches the driver); scoring joins
    * read them directly. A `trigrams/` directory marks an order-3
    * model — the save layout carries the order, so load cannot
    * silently downgrade a trigram model to bigram scoring. Score
    * parity with the freshly-trained model is pinned by NgramLmSpec. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model =
    Model(
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/unigrams"),
      spark.read.parquet(s"$dir/totals"),
      if (java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"$dir/trigrams")))
        Some(spark.read.parquet(s"$dir/trigrams"))
      else None)

  /** Train n-gram counts from a reference corpus at `order` 2 (the
    * default bigram model) or 3 (adds the trigram census — one more
    * partial-agg counting pass, same map-side-combine shape).
    * Documents with fewer than n tokens contribute the lower-order
    * counts only; blank/null documents contribute nothing. */
  def train(ref: DataFrame, textCol: String = "text",
            order: Int = 2): Model = {
    require(order == 2 || order == 3, s"order ($order) must be 2 or 3")
    val toked = ref
      .select(split(Dedup.normText(col(textCol)), "\\s+").as("__toks"))
      .filter(size(col("__toks")) > 0 && col("__toks")(0) =!= "")
    val unigrams = toked
      .select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bigrams = toked
      .select(explode(bigramStructs(col("__toks"))).as("g"))
      .select(col("g.w1"), col("g.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val totals = unigrams.agg(
      sum(col("c1")).as("total_toks"),
      count(lit(1)).as("vocab"))
    val trigrams =
      if (order < 3) None
      else Some(toked
        .select(explode(trigramStructs(col("__toks"))).as("g"))
        .select(col("g.w1"), col("g.w2"), col("g.w3"))
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3")))
    Model(bigrams, unigrams, totals, trigrams)
  }

  /** Adjacent-pair structs of a MATERIALIZED token array — kept as a
    * struct (not [[Dedup.ngrams]]' joined string) because scoring keys
    * the model join on the two words separately. `arrays_zip` over two
    * shifted slices, NOT `transform(sequence(...), i -> struct(...))`:
    * HOF lambdas evaluate interpreted, and the lambda form measured
    * ~7× slower end-to-end on the registered query (slice/arrays_zip
    * stay inside whole-stage codegen). */
  private[ext] def bigramStructs(toks: org.apache.spark.sql.Column) =
    when(size(toks) >= 2,
      arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("w1"),
        slice(toks, lit(2), size(toks) - 1).as("w2")))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Adjacent-triple structs — [[bigramStructs]]' shifted-slice zip at
    * width 3 (same codegen rationale). */
  private[ext] def trigramStructs(toks: org.apache.spark.sql.Column) =
    when(size(toks) >= 3,
      arrays_zip(
        slice(toks, lit(1), size(toks) - 2).as("w1"),
        slice(toks, lit(2), size(toks) - 2).as("w2"),
        slice(toks, lit(3), size(toks) - 2).as("w3")))
      .otherwise(array().cast("array<struct<w1:string,w2:string,w3:string>>"))

  /** Score documents against a trained model. Appends (all
    * `lm_`-prefixed — the [[QualityScore.scored]] collision rule):
    *
    *   - `lm_grams`      bigrams in the document (0 for < 2 tokens)
    *   - `lm_hits`       grams found in the model's bigram table
    *   - `lm_logp_micro` Σ gram log-probabilities, integer micro-nats
    *   - `lm_ppl`        exp(-avg), 3 dp — null when `lm_grams` = 0
    *   - `lm_band`       head / middle / tail / empty
    *
    * Thresholds are per-gram micro-nats (avg log-prob cuts):
    * [[HeadMicro]] ≈ ppl 100, [[TailMicro]] ≈ ppl 1000 by default. */
  def scored(docs: DataFrame, model: Model, textCol: String = "text",
             keyCol: String = "doc_id",
             headMicro: Long = HeadMicro,
             tailMicro: Long = TailMicro): DataFrame = {
    require(headMicro >= tailMicro,
      s"headMicro ($headMicro) must be >= tailMicro ($tailMicro)")
    if (model.trigrams.isDefined)
      return scored3(docs, model, textCol, keyCol, headMicro, tailMicro)
    // Per-(doc, gram) multiplicity first: the skew cap — one probe row
    // per distinct gram per document, however often it repeats.
    val probe = docs
      .select(col(keyCol).as("__k"),
        explode(bigramStructs(split(Dedup.normText(col(textCol)), "\\s+")))
          .as("g"))
      .select(col("__k"), col("g.w1"), col("g.w2"))
      .groupBy("__k", "w1", "w2").agg(count(lit(1)).as("m"))
    val joined = probe
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.unigrams.select(col("w").as("w1"), col("c1")),
        Seq("w1"), "left")
      .join(model.unigrams.select(col("w").as("w2"), col("c1").as("cu2")),
        Seq("w2"), "left")
      .join(broadcast(model.totals))
    // ONE rounding per gram; exact integers after this point. The
    // backoff's ln(0.4 * p) splits into BackoffMicro + round(1e6 ln p):
    // two integer constants added — replayable exactly, and the split
    // keeps every rounded term a pure function of model counts.
    val gramMicro = when(col("c2").isNotNull,
        round(lit(1e6) * log(col("c2").cast("double") / col("c1"))).cast("long"))
      .otherwise(lit(BackoffMicro) +
        round(lit(1e6) * log(
          (coalesce(col("cu2"), lit(0L)) + lit(1L)).cast("double") /
            (col("total_toks") + col("vocab")))).cast("long"))
    val perDoc = joined
      .groupBy(col("__k"))
      .agg(sum(col("m")).as("lm_grams"),
        sum(when(col("c2").isNotNull, col("m")).otherwise(lit(0L)))
          .as("lm_hits"),
        sum(col("m") * gramMicro).as("lm_logp_micro"))
    assemble(docs, perDoc, keyCol, headMicro, tailMicro)
  }

  /** Trigram stupid backoff — the [[scored]] shape one order up
    * (CCNet's published filter is a higher-order KenLM; same counting
    * / backoff / micro-nat discipline, VERDICT r9 next #5):
    *
    *   p(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)            if c3 > 0
    *                 = 0.4 · c(w2 w3) / c(w2)            elif c(w2 w3) > 0
    *                 = 0.4² · (c(w3) + 1) / (total + V)  otherwise
    *
    * TWO-level backoff: each CASE arm is [[BackoffMicro]] per level
    * ADDED as an integer plus ONE rounded log — the 0.4² arm is
    * `2·BackoffMicro`, the documented two-integer-constants split
    * (NOT round(1e6·ln 0.16), which would round the product instead
    * of the factors — the oracle replays the same association).
    * Denominators in the hit arms are non-null by construction: a
    * seen trigram implies its (w1,w2) bigram was counted, a seen
    * backoff bigram implies w2 was. The probe pre-aggregates per
    * (doc, w1, w2, w3) — the same hot-gram skew cap — and the model
    * joins add ONE extra equi-join versus the bigram path. */
  private def scored3(docs: DataFrame, model: Model, textCol: String,
                      keyCol: String, headMicro: Long,
                      tailMicro: Long): DataFrame = {
    val probe = docs
      .select(col(keyCol).as("__k"),
        explode(trigramStructs(split(Dedup.normText(col(textCol)), "\\s+")))
          .as("g"))
      .select(col("__k"), col("g.w1"), col("g.w2"), col("g.w3"))
      .groupBy("__k", "w1", "w2", "w3").agg(count(lit(1)).as("m"))
    val joined = probe
      .join(model.trigrams.get, Seq("w1", "w2", "w3"), "left")
      .join(model.bigrams.select(col("w1"), col("w2"), col("c2").as("cb_ctx")),
        Seq("w1", "w2"), "left")
      .join(model.bigrams.select(col("w1").as("w2"), col("w2").as("w3"),
          col("c2").as("cb_back")),
        Seq("w2", "w3"), "left")
      .join(model.unigrams.select(col("w").as("w2"), col("c1").as("cu2")),
        Seq("w2"), "left")
      .join(model.unigrams.select(col("w").as("w3"), col("c1").as("cu3")),
        Seq("w3"), "left")
      .join(broadcast(model.totals))
    val gramMicro = when(col("c3").isNotNull,
        round(lit(1e6) * log(col("c3").cast("double") / col("cb_ctx")))
          .cast("long"))
      .when(col("cb_back").isNotNull, lit(BackoffMicro) +
        round(lit(1e6) * log(col("cb_back").cast("double") / col("cu2")))
          .cast("long"))
      .otherwise(lit(2L * BackoffMicro) +
        round(lit(1e6) * log(
          (coalesce(col("cu3"), lit(0L)) + lit(1L)).cast("double") /
            (col("total_toks") + col("vocab")))).cast("long"))
    val perDoc = joined
      .groupBy(col("__k"))
      .agg(sum(col("m")).as("lm_grams"),
        sum(when(col("c3").isNotNull, col("m")).otherwise(lit(0L)))
          .as("lm_hits"),
        sum(col("m") * gramMicro).as("lm_logp_micro"))
    assemble(docs, perDoc, keyCol, headMicro, tailMicro)
  }

  /** The shared per-document reassembly: left-join the probe aggregate
    * back (zero-gram docs coalesce to 0/empty), derive display `lm_ppl`
    * FROM the integer sum, band by integer cross-multiply. */
  private def assemble(docs: DataFrame, perDoc: DataFrame, keyCol: String,
                       headMicro: Long, tailMicro: Long): DataFrame =
    docs
      .join(perDoc.withColumnRenamed("__k", keyCol), Seq(keyCol), "left")
      .withColumn("lm_grams", coalesce(col("lm_grams"), lit(0L)))
      .withColumn("lm_hits", coalesce(col("lm_hits"), lit(0L)))
      .withColumn("lm_logp_micro", coalesce(col("lm_logp_micro"), lit(0L)))
      .withColumn("lm_ppl",
        when(col("lm_grams") > 0,
          round(exp(-col("lm_logp_micro").cast("double") / lit(1e6) /
            col("lm_grams")), 3)))
      .withColumn("lm_band",
        when(col("lm_grams") === 0, lit("empty"))
          .when(col("lm_logp_micro") >= lit(headMicro) * col("lm_grams"),
            lit("head"))
          .when(col("lm_logp_micro") >= lit(tailMicro) * col("lm_grams"),
            lit("middle"))
          .otherwise(lit("tail")))
}
