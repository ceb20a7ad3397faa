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

  /** Whitespace token count — the same tokenization as
    * [[TextAnalysis]] (and the x3 oracles): tokens of the trimmed text. */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

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
    val target = weights.foldLeft(lit(0L): Column) { case (acc, (src, w)) =>
      when(col("source") === src, lit(math.round(w * totalTokens))).otherwise(acc)
    }
    sourceTotals(docs, textCol, srcCol)
      .withColumn("target_tokens", target)
      // Quantized keep threshold in [0, 10000]: explicit floor(x+0.5) so
      // Spark and the SQL oracle round half-up identically.
      .withColumn("keep_threshold",
        floor(least(lit(1.0),
          col("target_tokens") / col("tokens_in")) * 10000 + lit(0.5)).cast("long"))
  }

  /** The mixed corpus: input columns, filtered to the survivors of the
    * per-source rate. One census aggregate + one broadcast join; the
    * corpus itself never shuffles. */
  def mixToBudget(docs: DataFrame, textCol: String = "text",
                  keyCol: String = "doc_id", srcCol: String = "source",
                  weights: Map[String, Double], totalTokens: Long,
                  seed: Long = 42L): DataFrame = {
    val rates = rateFrame(docs, textCol, srcCol, weights, totalTokens)
      .select(col("source").as(srcCol), col("keep_threshold"))
    docs.join(broadcast(rates), srcCol)
      .filter(Sampling.bucket(col(keyCol), seed) < col("keep_threshold"))
      .select(docs.columns.toIndexedSeq.map(col): _*)
  }

  /** Recipe audit: per source, supply vs target vs achieved — the frame a
    * recipe author reads to decide re-weighting. Two aggregates total
    * (census + achieved), both partial-agg, joined on the tiny source
    * key. Output: (source, n_docs, tokens_in, target_tokens, docs_kept,
    * tokens_kept), ordered. */
  def mixSummary(docs: DataFrame, textCol: String = "text",
                 keyCol: String = "doc_id", srcCol: String = "source",
                 weights: Map[String, Double], totalTokens: Long,
                 seed: Long = 42L): DataFrame = {
    val rates = rateFrame(docs, textCol, srcCol, weights, totalTokens)
    val kept = docs.join(
        broadcast(rates.select(col("source").as(srcCol), col("keep_threshold"))), srcCol)
      .filter(Sampling.bucket(col(keyCol), seed) < col("keep_threshold"))
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

  /** Deterministic global training order: documents reordered by a keyed
    * hash (shuffle-the-corpus-once, the step between mixing and
    * [[Packing]]). The sort key is engine-replayable ([[Sampling.bucket]]
    * + key tiebreak); Spark executes it as a range-partitioned sort — no
    * single-reducer bottleneck at any corpus size. */
  def trainingOrder(docs: DataFrame, keyCol: String = "doc_id",
                    seed: Long = 42L): DataFrame =
    docs.withColumn("shuffle_key", Sampling.bucket(col(keyCol), seed))
      .orderBy(col("shuffle_key"), col(keyCol))
}
