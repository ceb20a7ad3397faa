package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X27 — per-group EXACT score percentiles + the adaptive quality
  * threshold built on them (the FineWeb recipe: filter cut-points are
  * set per CommonCrawl dump as "drop the bottom p% of THAT dump", not
  * as one global constant, because score distributions drift across
  * dumps/sources — a fixed threshold that trims 10% of one crawl
  * removes 40% of another).
  *
  * `scorePercentiles` appends `pctl_ppm` — the within-group cumulative
  * fraction of rows with score ≤ this row's score, in parts-per-million
  * (cume_dist semantics, floored to an exact integer) — and
  * `percentileGate` turns it into the keep verdict
  * `pctl_ppm ≥ minPpm` ("survive unless in the bottom decile of your
  * own source").
  *
  * Scale shape — this is NOT the naive
  * `cume_dist() OVER (PARTITION BY group ORDER BY score)`: that plan
  * shuffles EVERY corpus row to its group's reducer and sorts it there
  * — an 80-TB single-task sort for an 80%-of-corpus `en` stratum, the
  * same skewed-window shape the staged [[TopK]] and the sharded writer
  * exist to kill. Instead:
  *
  *  1. census: `groupBy(group, score).count()` — ONE aggregate with
  *     map-side partial combine; rows collapse to (group, distinct
  *     score) pairs per partition BEFORE the shuffle;
  *  2. CDF: two windows over the CENSUS (cumulative ≤-count and group
  *     total) — the window input is (groups × distinct scores), not
  *     corpus rows. The caller's score is expected to be the house
  *     integer band (a [[QualityScore]] score, a char/token count),
  *     so this frame is tiny at any corpus size;
  *  3. join back on (group, score) — broadcast by default (the CDF
  *     frame is dim-sized); set `broadcastCdf = false` to fall back to
  *     a hash join if a pathological score domain makes it large.
  *
  * Exactness: `pctl_ppm = (cum_le · 10⁶) div total` is all integer
  * arithmetic — Spark's `div` and DuckDB's `//` truncate identically
  * for the non-negative operands here, so the oracle replays the
  * naive `cume_dist` window and must match the staged plan bit for
  * bit.
  *
  * Nulls: rows with a NULL score are excluded from the census (they
  * have no rank among real scores), come back with `pctl_ppm` NULL
  * from the left join, and fail the gate (`coalesce(…, false)`) — an
  * unscored document never survives an adaptive quality cut. A NULL
  * group is a real stratum (null-safe join key), matching the house
  * census discipline. */
object Calibrate {

  /** Appends `pctl_ppm` (within-`groupCol` cume_dist of `scoreCol`,
    * parts-per-million, exact integer) to every input row. */
  def scorePercentiles(docs: DataFrame, scoreCol: String,
                       groupCol: String,
                       broadcastCdf: Boolean = true): DataFrame = {
    val c = cdf(docs, scoreCol, groupCol)
    val dim = if (broadcastCdf) broadcast(c) else c
    docs.join(dim,
        docs(groupCol) <=> dim("__g") && docs(scoreCol) === dim("__s"),
        "left")
      .drop("__g", "__s")
  }

  /** ONE definition of the census → per-group integer CDF — shared by
    * [[scorePercentiles]] and [[thresholds]] (the rankFromStats
    * discipline: the gate ⇔ cut equivalence must hold by construction,
    * not only by test). Output: (__g, __s, pctl_ppm) over distinct
    * (group, non-null score) pairs. */
  private def cdf(docs: DataFrame, scoreCol: String,
                  groupCol: String): DataFrame = {
    val census = docs
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
    val byGroup = Window.partitionBy(col("__g"))
    census
      .withColumn("__cum",
        sum(col("__n")).over(byGroup.orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__n")).over(byGroup))
      .select(col("__g"), col("__s"),
        expr("(__cum * 1000000) div __tot").as("pctl_ppm"))
  }

  /** [[scorePercentiles]] + the keep verdict: `is_kept` ⇔ the row's
    * score sits at or above the `minPpm` percentile of its own group
    * (NULL score ⇒ false). `minPpm = 100000` is "drop the bottom
    * decile of every source" — the FineWeb per-dump cut. */
  def percentileGate(docs: DataFrame, scoreCol: String, groupCol: String,
                     minPpm: Long, broadcastCdf: Boolean = true)
      : DataFrame = {
    require(minPpm >= 0L && minPpm <= 1000000L,
      s"minPpm ($minPpm) must be in [0, 1000000]")
    scorePercentiles(docs, scoreCol, groupCol, broadcastCdf)
      .withColumn("is_kept",
        coalesce(col("pctl_ppm") >= lit(minPpm), lit(false)))
  }

  /** The per-group CUT SCORES the gate above implies: for each group,
    * the smallest score whose percentile clears `minPpm` — so
    * `score >= cut_score` is EXACTLY `pctl_ppm >= minPpm` for every
    * real score (both sides of the equivalence are monotone in the
    * same total order; derived from the SAME [[cdf]] definition the
    * row gate uses, and additionally pinned by test). One tiny frame
    * (grp, cut_score).
    *
    * This is the deployment artifact: fit the cuts on the reference
    * corpus ONCE ([[save]]), then gating tomorrow's shard is a
    * broadcast join + one comparison ([[gateAgainst]]) — map-only,
    * zero corpus shuffles, no CDF recomputation — the X1h/X15/X16
    * fit-once-probe-cheaply contract applied to quality thresholds. */
  def thresholds(docs: DataFrame, scoreCol: String, groupCol: String,
                 minPpm: Long): DataFrame = {
    require(minPpm >= 0L && minPpm <= 1000000L,
      s"minPpm ($minPpm) must be in [0, 1000000]")
    cdf(docs, scoreCol, groupCol)
      .filter(col("pctl_ppm") >= lit(minPpm))
      .groupBy(col("__g").as("grp"))
      .agg(min(col("__s")).as("cut_score"))
  }

  /** Persist fitted cuts as parquet: the thresholds frame plus a
    * one-row params frame (minPpm + the fitted column names), so a
    * probe can assert it loaded the model it expects ([[load]]'s
    * expect* parameters). */
  def save(cuts: DataFrame, scoreCol: String, groupCol: String,
           minPpm: Long, dir: String): Unit = {
    cuts.write.mode("overwrite").parquet(s"$dir/cuts")
    val spark = cuts.sparkSession
    import spark.implicits._
    Seq((minPpm, scoreCol, groupCol))
      .toDF("min_ppm", "score_col", "group_col")
      .write.mode("overwrite").parquet(s"$dir/params")
  }

  /** Load a saved cuts frame (columns read BY NAME — the r9 index
    * discipline). Pass `expectScore`/`expectGroup` to FAIL LOUDLY if
    * the artifact was fitted on different columns than the probe
    * intends — a silent mismatch would gate every row on the wrong
    * score scale (or fail every stratum as unseen). */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
           expectScore: Option[String] = None,
           expectGroup: Option[String] = None): (DataFrame, Long) = {
    val cuts = spark.read.parquet(s"$dir/cuts").select("grp", "cut_score")
    val params = spark.read.parquet(s"$dir/params")
      .select("min_ppm", "score_col", "group_col").head()
    expectScore.foreach(e => require(params.getString(1) == e,
      s"cuts at $dir were fitted on score '${params.getString(1)}', " +
        s"probe expects '$e'"))
    expectGroup.foreach(e => require(params.getString(2) == e,
      s"cuts at $dir were fitted on group '${params.getString(2)}', " +
        s"probe expects '$e'"))
    (cuts, params.getLong(0))
  }

  /** Serve-time gate against FITTED cuts: appends `cut_score` (the
    * group's floor, NULL for groups the fit never saw) and `is_kept`
    * (`score >= cut_score`; NULL score OR unknown group => false —
    * an unscored document, or one from a stratum the reference corpus
    * has no distribution for, never survives an adaptive cut by
    * default). Map-only over the corpus: the cuts frame is
    * |groups|-sized at any corpus scale, so the join broadcasts.
    * Alias-safe: the cuts columns ride internal names through the
    * join, and a pre-existing `cut_score`/`is_kept` on the input is
    * OVERWRITTEN (re-gating replaces the previous verdict — compose
    * passes by renaming first if both verdicts must survive). */
  def gateAgainst(docs: DataFrame, cuts: DataFrame, scoreCol: String,
                  groupCol: String): DataFrame =
    docs.drop("cut_score", "is_kept")
      .join(broadcast(cuts.select(col("grp").as("__cal_grp"),
          col("cut_score").as("__cal_cut"))),
        col(groupCol) <=> col("__cal_grp"), "left")
      .withColumn("cut_score", col("__cal_cut"))
      .withColumn("is_kept",
        coalesce(col(scoreCol) >= col("__cal_cut"), lit(false)))
      .drop("__cal_grp", "__cal_cut")
}
