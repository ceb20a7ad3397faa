package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X38 — fuzzy (approximate-string) cross-table join: record linkage by
  * character-trigram Jaccard. The entity-resolution primitive every
  * warehouse eventually needs — vendor names against the master list,
  * crawl bylines against an author table — and the cross-TABLE
  * complement of [[Dedup.jaccardPairs]]' within-corpus near-dup pairs.
  *
  * Semantics (all deterministic, engine-replayable):
  *   - each name lowercases and decomposes into its DISTINCT character
  *     3-gram set (names shorter than 3 chars have an empty set and can
  *     never match);
  *   - candidate pairs come from an inverted-index equality join on the
  *     trigram, restricted to COLD trigrams (right-side document
  *     frequency <= dfCap) — the standard blocking step: a trigram every
  *     row shares ("cus" in Customer#…) generates the all-pairs square
  *     and carries no signal;
  *   - each candidate verifies EXACTLY on the full trigram sets
  *     (intersection / union over every trigram, hot ones included), so
  *     the cap bounds candidate volume but never biases a verified
  *     score;
  *   - the score is the ppm-quantized Jaccard `(|∩|·10⁶) div |∪|` — an
  *     integer, so ranking and thresholds are exact 64-bit comparisons
  *     (the cross-multiplied rational i1·u2 > i2·u1 is not a sort key;
  *     the quantized form is, and the quantization is part of the
  *     contract).
  *
  * Scale shape: the trigram vocabulary is intrinsically bounded by
  * |charset|³ (~50k for lowercase alphanumerics — dim-sized at ANY
  * corpus size), so the df census is a tiny partial-agg frame and the
  * cold-trigram list BROADCASTs into the blocking join; the inverted
  * index join shuffles on the trigram with per-gram fan-out capped at
  * dfCap·|left posting|; the exact verify is map-side `array_intersect`
  * over the two bounded gram arrays after co-partitioned key joins — no
  * corpus window, no cartesian anywhere.
  */
object FuzzyJoin {

  /** Distinct lowercase character 3-gram set of `c` (empty below 3
    * chars — `sequence(1, 0)` would count DOWN, so the guard is
    * load-bearing). */
  def trigrams(c: Column): Column = {
    val lc = lower(c)
    when(length(lc) >= 3,
      array_distinct(transform(sequence(lit(1), length(lc) - lit(2)),
        i => lc.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Match each left row's `leftName` against right rows' `rightName` by
    * trigram Jaccard; emits the top-`n` right matches per left key at
    * `minJaccardPpm` or better, ranked (jaccard_ppm DESC, right key ASC)
    * through the [[TopK]] staged skew-safe plan (a hot left key — one
    * dirty name matching thousands — never funnels a corpus through one
    * reducer task).
    *
    * Output: (leftKey, rightKey, n_inter, n_union, jaccard_ppm,
    * rank_in_group). Null names have no trigrams and emit nothing.
    */
  def trigramJoin(
      left: DataFrame, leftKey: String, leftName: String,
      right: DataFrame, rightKey: String, rightName: String,
      minJaccardPpm: Long = 500000L, n: Int = 1,
      dfCap: Long = 64L): DataFrame = {
    require(minJaccardPpm >= 0 && minJaccardPpm <= 1000000L,
      s"minJaccardPpm ($minJaccardPpm) must be a ppm in [0, 1000000]")
    require(dfCap >= 1, s"dfCap ($dfCap) must be >= 1")

    val l = left.select(col(leftKey).as("__lk"),
      trigrams(col(leftName)).as("__lg"))
    val r = right.select(col(rightKey).as("__rk"),
      trigrams(col(rightName)).as("__rg"))

    val lPost = l.select(col("__lk"), explode(col("__lg")).as("__g"))
    val rPost = r.select(col("__rk"), explode(col("__rg")).as("__g"))
    // Cold-trigram list: dim-sized by the |charset|³ bound → broadcast.
    val cold = rPost.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap).select("__g")

    // BOTH posting streams prune to cold trigrams before the inverted
    // -index shuffle — a hot gram's postings can never match once the
    // other side is filtered, so shipping them is pure waste.
    val cand = lPost.join(broadcast(cold), "__g")
      .join(rPost.join(broadcast(cold), "__g"), "__g")
      .select("__lk", "__rk").distinct()

    // Exact verify on the FULL sets: candidates join back to the gram
    // arrays co-partitioned on each key; intersection is map-side.
    val verified = cand.join(l, "__lk").join(r, "__rk")
      .withColumn("__ni", size(array_intersect(col("__lg"), col("__rg"))).cast("long"))
      .withColumn("__nu",
        size(col("__lg")).cast("long") + size(col("__rg")) - col("__ni"))
      .filter(col("__nu") > 0)
      .withColumn("jaccard_ppm",
        // Integer div (Spark's `/` on longs returns double): exact.
        expr("(__ni * 1000000) div __nu").cast("long"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("__lk").as(leftKey), col("__rk").as(rightKey),
        col("__ni").as("n_inter"), col("__nu").as("n_union"),
        col("jaccard_ppm"))

    TopK.topNPerGroup(verified, groupCol = leftKey,
      scoreCol = "jaccard_ppm", n = n, keyCol = rightKey)
  }
}
