package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X24 — TF-IDF keyword extraction: each document's top-k terms by
  * term-frequency × inverse-document-frequency — the classic
  * keyword/topic signal (dataset exploration, cluster labeling,
  * quality-rule authoring over what a corpus is actually about).
  *
  * Float discipline (the x15/x16/x20 micro-nat pattern): idf =
  * round(10⁶·ln(N/df)) is the ONLY rounding — per-term, engine-checked
  * by the MicroNatSlackSpec boundary audit — and the score is the
  * plain integer product tf·idf_micro, so ranking and hashing are
  * exact 64-bit arithmetic. Ties rank deterministically by
  * (score desc, term asc).
  *
  * Scale shape: one explode → (doc, term) partial-agg count (the tf
  * frame, one shuffle), one term-keyed partial-agg census for df
  * (second shuffle, |vocab| rows), a broadcast N, and a per-document
  * window for the top-k cut — fine-grained partitions (one per doc),
  * the case where `Window.partitionBy` is right. DF-join fan-in is
  * |doc·distinct-term| rows, never the raw token stream.
  */
object TfIdf {

  def topTerms(docs: DataFrame, textCol: String = "text",
               keyCol: String = "doc_id", k: Int = 3): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val tf = docs
      .select(col(keyCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(keyCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfCensus = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf
      .join(dfCensus, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf_micro",
        round(log(col("__n").cast("double") / col("df")) * lit(1000000.0), 0)
          .cast("long"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("score_micro").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(keyCol), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("score_micro"))
  }
}
