package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X44 — robust anomaly flags: median / MAD (median absolute deviation)
  * outliers per group — the robust twin of [[Anomaly]]'s z-score flags.
  * Mean/stddev are themselves dragged by the outliers they're supposed
  * to find (one 10⁶× bad row inflates σ until nothing flags); the
  * median/MAD pair has a 50% breakdown point and is the standard robust
  * screen for sensor glitches, price-feed spikes, and corrupt measure
  * columns.
  *
  * Exactness discipline — the TWICE-MEDIAN trick: measures quantize to
  * the data's own 4-dp grain (`DECIMAL(18,4)·10⁴` → long, the x18
  * scaled-long quantum), and every median is carried DOUBLED
  * (`med2 = round(2·percentile(scaled, 0.5))`): an interpolated median
  * of integers is either x.0 or x.5, so 2× it is an EXACT integer in
  * both engines (Spark `percentile` and DuckDB `quantile_cont` both
  * produce the exact .0/.5 double for integer inputs — no ulp exposure,
  * unlike interpolating raw doubles). The outlier test
  * `|v − med| > k·MAD` clears denominators to the all-integer
  * `2·D > k·mad2` where `D = |2·scaled − med2|` and
  * `mad2 = round(2·percentile(D, 0.5))` (= 4·MAD in scaled units).
  *
  * Scale shape (the X4 reasoning, doubled): measure groups are
  * few-valued, so per-group medians come from TWO partial-agg
  * percentile censuses (Spark's percentile aggregate merges per-value
  * count maps — map-side combine, bounded by the 4-dp value
  * cardinality, never a per-group row sort) with the tiny census
  * frames BROADCAST back — deliberately not `Window.partitionBy(type)`,
  * which is catastrophic skew with few groups.
  */
object RobustStats {

  /** Per-row flags: appends `scaled`, `med2`, `dev2`, `mad2`,
    * `is_outlier` (2·dev2 > k·mad2). */
  def madFlags(df: DataFrame, valueCol: String = "value",
               groupCol: String = "event_type", k: Long = 3L): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val scaled = df.withColumn("scaled",
      (col(valueCol).cast("decimal(18,4)") * lit(10000)).cast("long"))
    val medians = scaled.groupBy(col(groupCol))
      .agg(round(percentile(col("scaled"), lit(0.5)) * lit(2.0), 0)
        .cast("long").as("med2"))
    val withDev = scaled.join(broadcast(medians), Seq(groupCol))
      .withColumn("dev2", abs(col("scaled") * 2 - col("med2")))
    val mads = withDev.groupBy(col(groupCol))
      .agg(round(percentile(col("dev2"), lit(0.5)) * lit(2.0), 0)
        .cast("long").as("mad2"))
    withDev.join(broadcast(mads), Seq(groupCol))
      .withColumn("is_outlier", col("dev2") * 2 > lit(k) * col("mad2"))
  }

  /** FIT the per-group robust cuts: the (group, med2, mad2) frame —
    * dim-sized by construction (one row per group), the X27/X15
    * fit-once artifact. Persist with plain parquet; serve with
    * [[gateAgainst]]. */
  def fit(df: DataFrame, valueCol: String = "value",
          groupCol: String = "event_type", k: Long = 3L): DataFrame =
    madFlags(df, valueCol, groupCol, k)
      .groupBy(col(groupCol))
      .agg(max(col("med2")).as("med2"), max(col("mad2")).as("mad2"))

  /** SERVE the fitted cuts: one broadcast join + the all-integer
    * comparison per row — stateless, no aggregation, the same code on
    * batch and stream (the s9/s13 serve discipline). Rows from groups
    * the fit never saw FAIL SAFE (`is_outlier` null — neither flagged
    * clean nor outlier; route them to a refit). */
  def gateAgainst(df: DataFrame, cuts: DataFrame,
                  valueCol: String = "value",
                  groupCol: String = "event_type",
                  k: Long = 3L): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    df.withColumn("scaled",
        (col(valueCol).cast("decimal(18,4)") * lit(10000)).cast("long"))
      .join(broadcast(cuts), Seq(groupCol), "left_outer")
      .withColumn("dev2", abs(col("scaled") * 2 - col("med2")))
      .withColumn("is_outlier",
        when(col("med2").isNull, lit(null).cast("boolean"))
          .otherwise(col("dev2") * 2 > lit(k) * col("mad2")))
  }

  /** The registered census: per-group n, exact doubled median/MAD
    * integers, and the outlier count — ONE more partial aggregate over
    * [[madFlags]]. */
  def madCensus(df: DataFrame, valueCol: String = "value",
                groupCol: String = "event_type", k: Long = 3L): DataFrame =
    madFlags(df, valueCol, groupCol, k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("med2")).as("med2"),
        max(col("mad2")).as("mad2"),
        count(when(col("is_outlier"), lit(1))).as("n_outliers"))
      .orderBy(groupCol)
}
