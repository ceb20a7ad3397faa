package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G20 — column-pair correlation via EXACT sufficient statistics: the
  * profiling number behind "does discount actually track quantity" /
  * "is this measure redundant", computed the way a 1000-executor
  * cluster has to compute it — as the five MERGEABLE integer sums
  * (n, Σx, Σy, Σx², Σy², Σxy) rather than a float `corr()` whose
  * double accumulation is partition-order-dependent (two runs of the
  * built-in can legally differ in the last ulps; these sums cannot).
  * The same five numbers fold across shards and days (the BM25-index /
  * EmbedDrift mergeable-statistic posture), so incremental profiling
  * is addition, never a rescan.
  *
  * Exactness: measures quantize to their 4-dp grain; every sum
  * accumulates in DECIMAL(38,0) (Σy² at 10⁹-scaled values overflows a
  * long by 10⁵×); Pearson is then ONE double expression over the exact
  * integers with a pinned association — both engines convert the same
  * exact decimals and evaluate the identical IEEE tree, so even the
  * 6-dp display matches bit-for-bit.
  */
object Profiling {

  private def sc(c: Column): Column =
    (c.cast("decimal(18,4)") * lit(10000)).cast("decimal(38,0)")

  def corrStats(df: DataFrame, xCol: String, yCol: String,
                groupCol: String): DataFrame = {
    val x = sc(col(xCol))
    val y = sc(col(yCol))
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .withColumn("corr6",
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")), 6))
      .orderBy(groupCol)
  }
}
