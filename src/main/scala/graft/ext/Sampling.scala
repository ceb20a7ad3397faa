package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X6 — deterministic stratified sampling for training-data curation:
  * down-weight over-represented strata (language, source, quality band)
  * with per-stratum keep rates that are REPRODUCIBLE — the same row set
  * survives on every run, cluster size, and engine.
  *
  * Mechanism: a keyed multiplicative hash (Knuth 2654435761, high bits)
  * maps each row's key+seed to a bucket in [0, 10000); a row survives iff
  * its bucket < rate×10000. No RNG state, no partition-order dependence —
  * unlike `df.sample`/`sampleBy`, whose survivors change with
  * partitioning. The hash is plain integer arithmetic, so the DuckDB
  * oracle replays it exactly.
  *
  * At 100 TB this is a narrow map-only pass (no shuffle): the predicate
  * evaluates per row and pushes into the scan where the source supports
  * it. A production deployment wanting stronger mixing can swap the
  * multiplicative hash for `xxhash64` (Spark-native, codegen'd) at the
  * cost of engine-portable replay.
  */
object Sampling {

  private val Knuth = 2654435761L
  private val Buckets = 10000L

  /** Stable per-row bucket in [0, Buckets). Keys up to ~3.4e9 stay clear
    * of Long overflow (ANSI mode throws on wrap). */
  def bucket(key: Column, seed: Long): Column =
    pmod(shiftright((key + lit(seed)) * lit(Knuth), 16), lit(Buckets))

  /** The per-row bucket threshold for a rate map: a when-chain over the
    * strata, `defaultRate` otherwise. Rates quantize to 1/10000. */
  def keepThreshold(strataCol: String, rates: Map[String, Double],
                    defaultRate: Double = 1.0): Column = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    // math.round, not .toLong: truncation quantizes ~6% of exact
    // 4-decimal rates one bucket low (0.0003 * 10000 = 2.9999…).
    rates.foldLeft(
        lit(math.round(defaultRate * Buckets)): Column) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(math.round(rate * Buckets))).otherwise(acc)
    }
  }

  /** Keep each stratum at its configured rate (strata absent from
    * `rates` fall back to `defaultRate`). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double = 1.0,
                       seed: Long = 42L): DataFrame =
    df.filter(bucket(col(keyCol), seed) <
      keepThreshold(strataCol, rates, defaultRate))

  /** Audit view: per-stratum input size, survivor count, achieved rate —
    * one aggregate over the sampled-or-not flag (single scan, no join). */
  def sampleSummary(df: DataFrame, keyCol: String, strataCol: String,
                    rates: Map[String, Double], defaultRate: Double = 1.0,
                    seed: Long = 42L): DataFrame = {
    val threshold = keepThreshold(strataCol, rates, defaultRate)
    df.groupBy(col(strataCol).as("stratum")).agg(
        count(lit(1)).as("n_in"),
        count(when(bucket(col(keyCol), seed) < threshold, lit(1))).as("n_kept"))
      .withColumn("kept_rate",
        round(col("n_kept") / col("n_in").cast("double"), 4))
      .orderBy("stratum")
  }
}
