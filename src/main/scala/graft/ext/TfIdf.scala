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

  /** X24b — BM25 document ranking for a fixed query-term set: the IR
    * workhorse behind corpus search, retrieval-based decontamination
    * review, and RAG-corpus indexing — TF-IDF's saturation-and-length-
    * normalized successor (Robertson/Spärck Jones; k1 saturates
    * repeated terms, b discounts long documents against the corpus
    * mean length).
    *
    * Exactness (the x24 discipline, extended): idf uses the standard
    * non-negative form `ln(1 + (N − df + ½)/(df + ½))`, pre-rounded
    * ONCE per term to micro-nats; the per-(doc, term) contribution
    * then clears every fraction by integer cross-multiplication —
    * `avgdl = L/N` stays a RATIONAL (corpus token total L over doc
    * count N, both integers; never a float division) —
    *
    *   contrib = (idf_micro · tf · (k1m+1000) · 1000)
    *             div (tf·10⁶ + k1m·(1000−bm) + (k1m·bm·len·N) div L)
    *
    * — two integer floor divisions, both mirrored exactly by DuckDB's
    * `//`. Overflow bound: the numerator tops out ~idf_micro·tf·2.2·10⁶
    * (< 2⁶³ for any N ≤ 10¹¹, tf ≤ 10⁴); the inner product
    * k1m·bm·len·N needs len·N < ~10¹³ — past ~10⁹ documents pre-scale
    * L and N by a common factor (the ratio is what matters); ANSI
    * throws loudly rather than ranking on wrapped arithmetic.
    *
    * Scale shape: the tf explode prunes to the QUERY TERMS before the
    * aggregate (a |terms|-element isin — map-side, so the shuffle
    * carries only matching grams), df comes from the same pruned
    * frame, and (N, L) is a ONE-ROW broadcast cross (the x24 shape).
    * Document length is computed in the same pass as the corpus scan.
    * Ties rank deterministically by (score desc, key asc). */
  def bm25Rank(docs: DataFrame, queryTerms: Seq[String],
               textCol: String = "text", keyCol: String = "doc_id",
               k: Int = 10, k1Milli: Long = 1200L, bMilli: Long = 750L)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0 && k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"bad params (k=$k, k1Milli=$k1Milli, bMilli=$bMilli)")
    val toks = docs.select(col(keyCol), col(textCol))
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      // ONE definition with the funnel/packing counts: null/blank = 0
      // (size(tokens('')) would count 1 — the [''] artifact); reuses
      // the materialized array, so the split regex runs once per row.
      .withColumn("dl",
        TextAnalysis.tokenCountFromToks(col(textCol), col("__toks")))
    val lens = toks.select(col(keyCol), col("dl"))
    val totals = lens.agg(count(lit(1)).as("__n"),
      coalesce(sum(col("dl")), lit(0L)).as("__l"))
    val tf = toks
      .select(col(keyCol), explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(keyCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfCensus = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(dfCensus, "term")
      .join(lens, keyCol)
      .crossJoin(broadcast(totals))
      .withColumn("idf_micro",
        round(log(lit(1.0) +
          (col("__n").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) * lit(1000000.0), 0).cast("long"))
      .withColumn("contrib_micro", expr(
        s"(idf_micro * tf * ${k1Milli + 1000L} * 1000) div " +
        s"(tf * 1000000 + ${k1Milli * (1000L - bMilli)} + " +
        s"(($k1Milli * $bMilli * dl * __n) div __l))"))
    val ranked = contrib
      .groupBy(col(keyCol))
      .agg(sum(col("contrib_micro")).as("bm25_micro"),
        count(lit(1)).as("terms_hit"))
    TopK.topNPerGroup(ranked.withColumn("__g", lit(1)),
        "__g", "bm25_micro", n = k, keyCol = keyCol)
      .select(col(keyCol),
        col("rank_in_group").cast("long").as("rank"),
        col("bm25_micro"), col("terms_hit"))
  }
}
