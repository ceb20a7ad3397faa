package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X4 — anomaly flagging on a measure column, the "investigate anomalies"
  * ask of the reference's ETL pipeline (Glue-etl-pipeline.py:14)
  * generalized to a per-group z-score operator.
  *
  * Scale shape: per-group mean/stddev come from ONE partial-aggregable
  * groupBy (tiny result — one row per group), joined back to the fact scan
  * (AQE broadcasts the stats side). This deliberately avoids
  * `Window.partitionBy(group)` for the stats, which would shuffle the
  * entire fact table into one partition per group — with a handful of
  * event types at 100 TB that is catastrophic skew.
  */
object Anomaly {

  /** Rows whose |z| exceeds `threshold` within their group.
    * Output: (idCol, groupCol, valueCol, z) ordered by id.
    *
    * Mean and stddev derive from exact DECIMAL sums of v and v² (then one
    * double division/sqrt), NOT `avg`/`stddev_samp`: those accumulate in
    * partition order (stddev_samp is a Welford merge), so a |z| sitting
    * on the threshold could flip IN OR OUT of the flag set depending on
    * the cluster's partitioning — this operator's verdict must not
    * depend on parallelism. */
  def zscoreFlags(df: DataFrame, valueCol: String, groupCol: String,
                  idCol: String, threshold: Double = 3.0): DataFrame = {
    val v = col(valueCol)
    // count(v), not count(*): sum() skips NULLs, so the denominator must
    // too — avg/stddev semantics. DECIMAL(38,6) bounds the domain at
    // |v| ≲ 1e15 (v² needs 32 integer digits); beyond that the cast
    // nulls out silently with ANSI off.
    val stats = df.groupBy(col(groupCol)).agg(
        count(v).as("__n"),
        sum(v.cast("decimal(38,6)")).cast("double").as("__s1"),
        sum((v * v).cast("decimal(38,6)")).cast("double").as("__s2"))
      .select(col(groupCol),
        (col("__s1") / col("__n")).as("__mean"),
        sqrt((col("__s2") - col("__s1") * col("__s1") / col("__n")) /
          (col("__n") - 1)).as("__sd"))
    df.join(stats, groupCol)
      .withColumn("z", round((col(valueCol) - col("__mean")) / col("__sd"), 4))
      .filter(abs(col("z")) > threshold)
      .select(col(idCol), col(groupCol), col(valueCol), col("z"))
      .orderBy(idCol)
  }

  /** Per-group anomaly summary: count, mean, stddev, flagged count —
    * one fused aggregate pass (flag predicate re-derived inside the same
    * scan via the two-pass stats join above would cost a second scan;
    * this summary instead reports the exact stats the flags derive from). */
  def anomalySummary(df: DataFrame, valueCol: String, groupCol: String,
                     idCol: String, threshold: Double = 3.0): DataFrame = {
    val flags = zscoreFlags(df, valueCol, groupCol, idCol, threshold)
    val v = col(valueCol)
    df.groupBy(col(groupCol)).agg(
        count(v).as("n"),
        sum(v.cast("decimal(38,6)")).cast("double").as("__s1"),
        sum((v * v).cast("decimal(38,6)")).cast("double").as("__s2"))
      .select(col(groupCol), col("n"),
        round(col("__s1") / col("n"), 4).as("mean_value"),
        round(sqrt((col("__s2") - col("__s1") * col("__s1") / col("n")) /
          (col("n") - 1)), 4).as("sd_value"))
      .join(
        flags.groupBy(col(groupCol)).agg(count(lit(1)).as("flagged")),
        Seq(groupCol), "left")
      .withColumn("flagged", coalesce(col("flagged"), lit(0L)))
      .orderBy(groupCol)
  }
}
