package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X13 — linear quality-classifier scoring: the fasttext-style "model
  * quality" hook of a curation pipeline, as a PURE-ARITHMETIC proxy
  * (public pipelines like CCNet/FineWeb gate documents on a learned
  * linear scorer over cheap text features; the engine's job is the
  * scoring/banding plumbing, not the learned weights — any weight
  * vector drops in).
  *
  * The score is a weighted sum of per-document feature RATIOS
  * (stopword ratio, alphabetic ratio, punctuation ratio, mean token
  * length), but no float division ever happens: with milli-unit integer
  * weights, `score ≥ t` multiplies through by the positive common
  * denominator `n_tokens·n_chars`, so every band decision is an
  * INTEGER comparison —
  *
  *   score_num = bias·ntok·nchar + w_stop·stop_hits·nchar
  *             + w_alpha·alpha_chars·ntok + w_punct·punct_chars·ntok
  *             + w_len·sum_tok_len·nchar
  *   band = high  iff score_num ≥ hi·ntok·nchar    (hi in milli-units)
  *        = medium iff score_num ≥ lo·ntok·nchar
  *
  * — exactly replayable by the SQL oracle (the Gopher cross-multiply
  * discipline). Overflow bound, precisely: the largest term is
  * ≤ 2000·ntok·nchar ≤ 2000·nchar², so the sum stays under 2⁶³ for ANY
  * content up to ~10⁷ chars per document (~10 MB text; realistic
  * tokenized text ~5× more). Past that, ANSI mode throws loudly rather
  * than banding on wrapped arithmetic — bound document size upstream
  * (the Gopher `too_long` cap at 100k tokens is the standard gate).
  *
  * Everything is ONE map-only pass per row (no shuffle); the census is
  * a partial-agg groupBy. The weight set is a broadcast-free plan
  * constant (weights are literals, the standard shape for a dozens-of-
  * features linear model; a learned multi-thousand-dim model would move
  * the weights into a broadcast array literal the same expression
  * consumes). [[Curation]]'s `is_quality` can consume the band via
  * `band =!= "low"` in place of the token-count gate.
  */
object QualityScore {

  /** Milli-unit integer weights (1000 = 1.0). Defaults reward stopword
    * density and alphabetic text, penalize punctuation, and lightly
    * reward longer tokens — an English-centric toy vector (like the
    * Gopher defaults, documented there) that exercises every term. */
  final case class Weights(
      bias: Long = 0L,
      stop: Long = 2000L,
      alpha: Long = 1000L,
      punct: Long = -1000L,
      meanTokLen: Long = 100L,
      stopwords: Seq[String] = Seq("a", "the", "and", "of", "is", "to", "in", "that"))

  /** Per-document integer features + `score_num` + `band`. Appends to
    * the input columns; `hi`/`lo` are milli-unit score thresholds.
    * Zero-token or zero-char documents band as `empty` (the score is
    * undefined — 0/0). */
  def scored(docs: DataFrame, textCol: String = "text",
             w: Weights = Weights(), hi: Long = 1500L, lo: Long = 800L): DataFrame = {
    require(hi >= lo, s"hi ($hi) must be >= lo ($lo)")
    val t = col(textCol)
    val toks = col("__toks")
    val stopArr = array(w.stopwords.map(lit): _*)
    val ntok = col("n_tokens")
    val nchar = col("n_chars")
    docs
      .withColumn("__toks", coalesce(TextAnalysis.tokens(t),
        array().cast("array<string>")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(t))
      .withColumn("n_chars", coalesce(length(t), lit(0)).cast("long"))
      .withColumn("stop_hits",
        size(filter(toks, x => array_contains(stopArr, x))).cast("long"))
      .withColumn("alpha_chars",
        coalesce(length(regexp_replace(t, "[^A-Za-z]", "")), lit(0)).cast("long"))
      .withColumn("punct_chars",
        (coalesce(length(t), lit(0)) -
          coalesce(length(regexp_replace(t, "[.,!?;:]", "")), lit(0))).cast("long"))
      .withColumn("sum_tok_len",
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)))
      .withColumn("score_num",
        lit(w.bias) * ntok * nchar +
          lit(w.stop) * col("stop_hits") * nchar +
          lit(w.alpha) * col("alpha_chars") * ntok +
          lit(w.punct) * col("punct_chars") * ntok +
          lit(w.meanTokLen) * col("sum_tok_len") * nchar)
      .withColumn("band",
        when(ntok === 0 || nchar === 0, lit("empty"))
          .when(col("score_num") >= lit(hi) * ntok * nchar, lit("high"))
          .when(col("score_num") >= lit(lo) * ntok * nchar, lit("medium"))
          .otherwise(lit("low")))
      .drop("__toks")
  }

  /** The band as ONE Column over (text, MATERIALIZED tokens) — the hook
    * the curation funnel's `is_quality` consumes
    * ([[Curation.Config.qualityWeights]]) without a second scoring pass
    * or column collisions with the corpus schema. `toks` must be a
    * projected column (two HOFs reference it — an inline split would
    * re-run the regex per reference). Decisions are identical to
    * [[scored]]'s `band` column (same arithmetic; parity pinned in
    * QualityScoreSpec). */
  def bandFromToks(t: Column, toks: Column, w: Weights = Weights(),
                   hi: Long = 1500L, lo: Long = 800L): Column = {
    require(hi >= lo, s"hi ($hi) must be >= lo ($lo)")
    val stopArr = array(w.stopwords.map(lit): _*)
    val ntok = when(t.isNull || length(trim(t)) === 0, lit(0L))
      .otherwise(size(toks).cast("long"))
    val nchar = coalesce(length(t), lit(0)).cast("long")
    val num =
      lit(w.bias) * ntok * nchar +
        lit(w.stop) * size(filter(toks, x => array_contains(stopArr, x)))
          .cast("long") * nchar +
        lit(w.alpha) * coalesce(length(regexp_replace(t, "[^A-Za-z]", "")), lit(0))
          .cast("long") * ntok +
        lit(w.punct) * (coalesce(length(t), lit(0)) -
          coalesce(length(regexp_replace(t, "[.,!?;:]", "")), lit(0)))
          .cast("long") * ntok +
        lit(w.meanTokLen) *
          aggregate(toks, lit(0L), (acc, x) => acc + length(x)) * nchar
    when(ntok === 0 || nchar === 0, lit("empty"))
      .when(num >= lit(hi) * ntok * nchar, lit("high"))
      .when(num >= lit(lo) * ntok * nchar, lit("medium"))
      .otherwise(lit("low"))
  }

  /** The registered, oracle-checked view: per-(lang, band) census with
    * the token mass each band carries — what a recipe author reads to
    * pick a quality cut. One partial-agg groupBy over the map-only
    * scoring pass. */
  def bandCensus(docs: DataFrame, textCol: String = "text",
                 w: Weights = Weights(), hi: Long = 1500L,
                 lo: Long = 800L): DataFrame =
    scored(docs, textCol, w, hi, lo)
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"))
      .orderBy("lang", "band")
}
