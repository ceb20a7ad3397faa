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
    * Document length RIDES the postings explode into the tf aggregate
    * (no corpus-side lens join); the only other corpus pass is the
    * (N, L) totals aggregate, which inherently needs every document.
    * Ties rank deterministically by (score desc, key asc). */
  def bm25Rank(docs: DataFrame, queryTerms: Seq[String],
               textCol: String = "text", keyCol: String = "doc_id",
               k: Int = 10, k1Milli: Long = 1200L, bMilli: Long = 750L)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0 && k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"bad params (k=$k, k1Milli=$k1Milli, bMilli=$bMilli)")
    // TWO corpus passes total, each tokenizing once: the (N, L) totals
    // need EVERY document (pass A), the postings only the matching
    // grams (pass B, with dl RIDING the explode so no third pass or
    // corpus-side join re-derives it — shared lineage is not shared
    // work in Spark; each subtree re-evaluates the split regex).
    val toks = docs.select(col(keyCol), col(textCol))
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      // ONE definition with the funnel/packing counts: null/blank = 0
      // (size(tokens('')) would count 1 — the [''] artifact); reuses
      // the materialized array, so the split regex runs once per row.
      .withColumn("dl",
        TextAnalysis.tokenCountFromToks(col(textCol), col("__toks")))
    val totals = toks.agg(count(lit(1)).as("__n"),
      coalesce(sum(col("dl")), lit(0L)).as("__l"))
    val tf = toks
      .select(col(keyCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(keyCol), col("term"))
      // dl is constant per key — max() just carries it through the
      // same aggregate the tf count rides (map-side combined).
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfCensus = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    rankFromStats(tf, dfCensus, totals, keyCol, k, k1Milli, bMilli)
  }

  /** ONE definition of the BM25 scoring + top-k over prepared stats —
    * shared by the fresh path ([[bm25Rank]]) and the persisted-index
    * probe ([[bm25Against]]), so the two can never disagree.
    * `postings` = (key, term, tf, dl); `dfCensus` = (term, df);
    * `totals` = ONE row (__n, __l). */
  private def rankFromStats(postings: DataFrame, dfCensus: DataFrame,
                            totals: DataFrame, keyCol: String, k: Int,
                            k1Milli: Long, bMilli: Long): DataFrame = {
    val contrib = postings
      .join(dfCensus, "term")
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

  /** X24c — the PERSISTED inverted index ([[saveIndex]] →
    * [[bm25Against]]): the deployment shape of corpus search. A 100 TB
    * corpus is indexed ONCE — full postings (doc, term, tf, dl), the
    * df census, and the (N, L) totals, as parquet — and every query
    * after that reads ONLY its terms' postings: the postings file is
    * written clustered-and-sorted by term, so the `term IN (…)` probe
    * prunes at the parquet row-group level (min/max stats) instead of
    * re-tokenizing the corpus per query. The X1h/X15/X16/X27
    * fit-once-probe-cheaply contract applied to search; save → probe
    * ≡ fresh [[bm25Rank]] is pinned in TfIdfSpec. */
  def saveIndex(docs: DataFrame, dir: String, textCol: String = "text",
                keyCol: String = "doc_id"): Unit = {
    val spark = docs.sparkSession
    val toks = docs.select(col(keyCol), col(textCol))
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("dl",
        TextAnalysis.tokenCountFromToks(col(textCol), col("__toks")))
    // dl rides the explode into the tf aggregate (bm25Rank's shape) —
    // no corpus-side lens join. TWO tokenization passes total: the
    // postings write and the doclens write (a zero-token document has
    // no postings row but still counts in N — the lens frame is the
    // full document census [[removeDocs]] decrements from); df and
    // totals then derive from RE-READS of the just-written artifacts
    // (2–5 longs/row of parquet), not third and fourth text parses.
    toks
      .select(col(keyCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(keyCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      // Cluster + sort by term so a term-probe read skips row groups
      // via parquet min/max stats — the shape that makes query-time
      // cost proportional to the QUERY's postings, not the corpus.
      .repartition(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$dir/postings")
    toks.select(col(keyCol), col("dl"))
      .write.mode("overwrite").parquet(s"$dir/doclens")
    spark.read.parquet(s"$dir/postings")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    spark.read.parquet(s"$dir/doclens")
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(col("dl")), lit(0L)).as("__l"))
      .write.mode("overwrite").parquet(s"$dir/totals")
  }

  /** X24d — incremental index maintenance: MERGE two [[saveIndex]]
    * artifacts over DISJOINT document sets into one, without touching
    * either corpus's text (the nightly-shard story for search — index
    * today's crawl, fold it into the historical index). Every index
    * component is a mergeable statistic: postings union (documents are
    * disjoint, so no per-document reconciliation), df adds per term,
    * (N, L) totals add. The merged artifact is INDISTINGUISHABLE from
    * indexing the union corpus fresh — probe-equality pinned in
    * TfIdfSpec, and the registered probe hash-matches the same full-
    * corpus oracle. Caller contract: the two indexes' document key
    * sets must be disjoint; re-indexing an updated document is
    * remove-then-add — [[removeDocs]] then this (the X25 corpus-diff
    * lane detects WHICH documents changed). */
  def mergeIndexes(spark: org.apache.spark.sql.SparkSession,
                   dirA: String, dirB: String, out: String): Unit = {
    val postings = spark.read.parquet(s"$dirA/postings")
      .unionByName(spark.read.parquet(s"$dirB/postings"))
    postings
      .repartition(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$out/postings")
    spark.read.parquet(s"$dirA/df")
      .unionByName(spark.read.parquet(s"$dirB/df"))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"))
      .write.mode("overwrite").parquet(s"$out/df")
    spark.read.parquet(s"$dirA/doclens")
      .unionByName(spark.read.parquet(s"$dirB/doclens"))
      .write.mode("overwrite").parquet(s"$out/doclens")
    spark.read.parquet(s"$dirA/totals")
      .unionByName(spark.read.parquet(s"$dirB/totals"))
      .agg(sum(col("__n")).as("__n"), sum(col("__l")).as("__l"))
      .write.mode("overwrite").parquet(s"$out/totals")
  }

  /** X24f — search-index DOCUMENT REMOVAL: [[mergeIndexes]]' inverse,
    * completing the nightly maintenance story (an updated document is
    * remove-then-add; a takedown/opt-out is remove alone). Every index
    * component decrements without touching any corpus text:
    *
    *  - postings: anti join on the key set (the only corpus-scaled
    *    frame; one artifact scan each for the kept and removed sides);
    *  - df: DECREMENT by the removed postings' per-term census — only
    *    the removed documents' terms are touched, and a term whose df
    *    hits 0 leaves the frame (its postings are gone with it);
    *  - doclens: anti join — this is WHY the lens frame is part of the
    *    artifact: a zero-token document has no postings row, so
    *    postings alone cannot tell whether a removed key was ever
    *    indexed, and (N, L) would drift by exactly those documents;
    *  - totals: re-censused from the kept lens frame (2 longs/row) —
    *    definitionally `count/sum` of doclens, the same derivation
    *    [[saveIndex]] uses, so remove → add ≡ fresh holds bit-for-bit
    *    (pinned in TfIdfSpec, and the registered probe hash-matches
    *    the fresh-on-remainder oracle).
    *
    * `keys` is a DataFrame, not a driver list — a takedown set can be
    * an X25 diff output at any scale; keys absent from the index are
    * no-ops (anti/semi joins ignore them). `out` must differ from
    * `dir`: the inputs are re-read while the outputs write. */
  def removeDocs(spark: org.apache.spark.sql.SparkSession, dir: String,
                 keys: DataFrame, out: String,
                 keyCol: String = "doc_id"): Unit = {
    require(dir != out,
      s"removeDocs must write to a NEW artifact dir (in-place overwrite " +
        s"of $dir would corrupt the postings mid-read)")
    val k = keys.select(col(keyCol)).distinct()
    val postings = spark.read.parquet(s"$dir/postings")
    postings.join(k, Seq(keyCol), "left_anti")
      .repartition(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$out/postings")
    val dec = postings.join(k, Seq(keyCol), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).as("__dec"))
    spark.read.parquet(s"$dir/df")
      .join(dec, Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("__dec"), lit(0L))).as("df"))
      .filter(col("df") > 0L)
      .write.mode("overwrite").parquet(s"$out/df")
    spark.read.parquet(s"$dir/doclens")
      .join(k, Seq(keyCol), "left_anti")
      .write.mode("overwrite").parquet(s"$out/doclens")
    spark.read.parquet(s"$out/doclens")
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(col("dl")), lit(0L)).as("__l"))
      .write.mode("overwrite").parquet(s"$out/totals")
  }

  /** X24e — MAP-ONLY relevance scoring of NEW documents against a
    * [[saveIndex]] artifact: the streaming-grade form of BM25. Ranking
    * a corpus needs a top-k; SCORING an arriving document needs only
    * its own (tf, dl) — computed per row from its text — and the
    * query terms' idf + the corpus (N, L), which are MODEL constants.
    * Those are fetched once from the saved index (a bounded
    * ≤|queryTerms|+1-row driver read — the persisted-model params
    * discipline) and inlined as plan LITERALS, so the whole scorer is
    * one stateless projection: no joins, no aggregation, no state —
    * it runs identically on a batch frame and on a structured stream
    * (micro-batch ≡ batch pinned in TfIdfSpec), the "filter tonight's
    * crawl for topic-relevant documents" deployment.
    *
    * Scoring is the SAME integer formula as [[bm25Rank]] (per-term
    * contributions summed; a document with no query term scores 0
    * with `terms_hit` 0), so the batch replay hash-matches a SQL
    * oracle deriving idf from the index's fit corpus. */
  def scoreAgainst(spark: org.apache.spark.sql.SparkSession, dir: String,
                   docs: DataFrame, queryTerms: Seq[String],
                   textCol: String = "text",
                   k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // Dedupe (ADVICE r11): the aggregate paths dedupe for free via
    // isin + groupBy(term) — a duplicate here would double-count its
    // slot into bm25_micro/terms_hit and diverge from bm25Rank on the
    // same term list.
    val terms = queryTerms.distinct
    val totals = spark.read.parquet(s"$dir/totals")
      .select("__n", "__l").head()
    val (n, l) = (totals.getLong(0), totals.getLong(1))
    val dfByTerm = spark.read.parquet(s"$dir/df").select("term", "df")
      .filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(n > 0L && l > 0L,
      s"index at $dir has an empty fit corpus (N=$n, L=$l)")
    val idf = terms.zipWithIndex.map { case (t, i) =>
      val df = dfByTerm.getOrElse(t, 0L)
      (t, i, math.round(math.log(1.0 +
        (n - df + 0.5) / (df + 0.5)) * 1000000.0))
    }
    // ONE token-array traversal for ALL query terms (the native
    // [[graft.functions.TermCounts]] hash probe — VERDICT r11 #5: the
    // per-term filter() HOF this replaces ran |terms| interpreted
    // passes per row, quadratic for wide queries; measured 3.4× at a
    // 20-term query over sf0.1, exact per-cell parity — BASELINE.md).
    // The per-term columns below are O(1) array extracts over the
    // counts.
    val withToks = docs
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__dl",
        TextAnalysis.tokenCountFromToks(col(textCol), col("__toks")))
      .withColumn("__tc",
        graft.functions.TextFunctions.termCounts(col("__toks"), terms))
    val scored = idf.foldLeft(withToks) { case (acc, (_, i, idfMicro)) =>
      acc
        .withColumn(s"__tf_$i", coalesce(get(col("__tc"), lit(i)), lit(0L)))
        .withColumn(s"__c_$i", when(col(s"__tf_$i") > 0L, expr(
          s"($idfMicro * __tf_$i * ${k1Milli + 1000L} * 1000) div " +
          s"(__tf_$i * 1000000 + ${k1Milli * (1000L - bMilli)} + " +
          s"(($k1Milli * $bMilli * __dl * $n) div $l))")).otherwise(lit(0L)))
    }
    scored
      .withColumn("bm25_micro",
        idf.map { case (_, i, _) => col(s"__c_$i") }.reduce(_ + _))
      .withColumn("terms_hit",
        idf.map { case (_, i, _) =>
          when(col(s"__tf_$i") > 0L, 1L).otherwise(0L) }.reduce(_ + _))
      .drop("__toks" +: "__dl" +: "__tc" +:
        idf.flatMap { case (_, i, _) => Seq(s"__tf_$i", s"__c_$i") }: _*)
  }

  /** BM25 top-k against a [[saveIndex]] artifact — query-time cost is
    * the query terms' postings (row-group pruned), two small joins,
    * and the staged top-k; the corpus text is never touched. Columns
    * read BY NAME (the r9 index discipline). */
  def bm25Against(spark: org.apache.spark.sql.SparkSession, dir: String,
                  queryTerms: Seq[String], keyCol: String = "doc_id",
                  k: Int = 10, k1Milli: Long = 1200L, bMilli: Long = 750L)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val postings = spark.read.parquet(s"$dir/postings")
      .select(col(keyCol), col("term"), col("tf"), col("dl"))
      .filter(col("term").isin(queryTerms: _*))
    val dfCensus = spark.read.parquet(s"$dir/df").select("term", "df")
      .filter(col("term").isin(queryTerms: _*))
    val totals = spark.read.parquet(s"$dir/totals").select("__n", "__l")
    rankFromStats(postings, dfCensus, totals, keyCol, k, k1Milli, bMilli)
  }
}
