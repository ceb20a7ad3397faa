package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X40 — dataset card: the per-source corpus datasheet every released
  * training set ships with (docs, token/char mass, blank and duplicate
  * rates, language spread, PII incidence, length distribution), computed
  * as ONE fused pass — the reporting twin of the X10 funnel audit, but
  * over the RAW corpus and cheap enough to run on every snapshot.
  *
  * Shape: every signal is a map-side per-row expression (token count,
  * fingerprint, PII counts — the exact definitions shared with
  * [[TextAnalysis]]/[[Dedup]]/[[Pii]], so the card can never disagree
  * with the operators it summarizes), then a single `ROLLUP(source)`
  * aggregate emits the per-source rows AND the corpus-total row from one
  * shuffle. The two distinct-aggregates (text fingerprint, language)
  * ride the same aggregate via Spark's expand; the fingerprint is the
  * 128-bit md5, so the distinct census shuffles 16 bytes/doc, never
  * text. No window, no collect, no second scan.
  *
  * Null/blank text: counted in `n_empty`, fingerprinted as the `''`
  * family (the [[CorpusDiff]] null discipline) so the duplicate census
  * sees one empty-text family rather than silently dropping rows.
  */
object DatasetCard {

  def card(docs: DataFrame, textCol: String = "text",
           groupCol: String = "source", langCol: String = "lang"): DataFrame = {
    val t = col(textCol)
    val signals = Pii.matchCounts(docs, textCol)
      .withColumn("__n_tok", TextAnalysis.tokenCount(t))
      .withColumn("__n_ch", coalesce(length(t).cast("long"), lit(0L)))
      .withColumn("__fp", coalesce(Dedup.fingerprintOf(t), lit("")))
      .withColumn("__blank", t.isNull || length(trim(t)) === 0)
      .withColumn("__pii",
        col("n_email") > 0 || col("n_phone") > 0 || col("n_ipv4") > 0)
    signals.rollup(col(groupCol))
      .agg(
        grouping(col(groupCol)).cast("long").as("grouping_level"),
        count(lit(1)).as("n_docs"),
        sum(col("__n_tok")).as("n_tokens"),
        sum(col("__n_ch")).as("n_chars"),
        count(when(col("__blank"), lit(1))).as("n_empty"),
        countDistinct(col("__fp")).as("n_distinct_text"),
        countDistinct(col(langCol)).as("n_langs"),
        count(when(col("__pii"), lit(1))).as("docs_with_pii"),
        round(sum(col("__n_tok")).cast("double") / count(lit(1)), 4)
          .as("mean_tok"),
        round(percentile(col("__n_tok"), lit(0.5)), 4).as("p50_tok"))
      .withColumn("dup_ppm",
        expr("((n_docs - n_distinct_text) * 1000000) div n_docs"))
      .select(
        coalesce(col(groupCol), lit("(all)")).as(groupCol),
        col("grouping_level"), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("n_empty"), col("n_distinct_text"),
        col("dup_ppm"), col("n_langs"), col("docs_with_pii"),
        col("mean_tok"), col("p50_tok"))
  }
}
