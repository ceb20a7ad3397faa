package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X6 — deterministic stratified sampling for training-data curation:
  * down-weight over-represented strata (language, source, quality band)
  * with per-stratum keep rates that are REPRODUCIBLE — the same row set
  * survives on every run, cluster size, and engine.
  *
  * Mechanism: a keyed integer hash maps each row's key+seed to a bucket
  * in [0, 10000); a row survives iff its bucket < rate×10000. No RNG
  * state, no partition-order dependence — unlike `df.sample`/`sampleBy`,
  * whose survivors change with partitioning. The hash is plain integer
  * arithmetic, so the DuckDB oracle replays it exactly.
  *
  * The hash is multiply → xor-shift → multiply → xor-shift (Knuth and
  * xxhash primes). The xor-shifts are load-bearing: a PURE multiplicative
  * hash maps arithmetic progressions of keys to arithmetic progressions
  * of buckets, so a STRIDED key set (interleaved shards, every-Nth-id
  * sources — exactly how per-source ids land in real corpora) clusters
  * into a narrow bucket band and a requested 58% rate can keep 94% or 0%
  * (measured, r5). XOR is non-affine, so the second multiply sees a
  * stride-free input; deciles over strided keys are uniform to ±5%.
  * All intermediates stay positive and below 2⁶³ for keys ≤ ~3.4e9
  * (ANSI mode throws on Long wrap, so the bound is loud, not silent).
  *
  * At 100 TB this is a narrow map-only pass (no shuffle): the predicate
  * evaluates per row and pushes into the scan where the source supports
  * it. A production deployment wanting stronger mixing can swap the
  * hash for `xxhash64` (Spark-native, codegen'd) at the cost of
  * engine-portable replay.
  */
object Sampling {

  private val Knuth = 2654435761L       // Knuth's 2^32 golden-ratio prime
  private val XxPrime = 2246822519L     // xxhash PRIME32_2
  private val Mask31 = 0x7FFFFFFFL      // keep the 2nd multiply under 2^63
  private val Buckets = 10000L

  /** Stable per-row bucket in [0, Buckets). Keys up to ~3.4e9 stay clear
    * of Long overflow (ANSI mode throws on wrap). Replay in SQL:
    * `h1 = (key + seed) * 2654435761`,
    * `h2 = xor(h1, h1 >> 31) & 2147483647`, `h3 = h2 * 2246822519`,
    * `bucket = xor(h3, h3 >> 29) % 10000` (all values positive, so plain
    * `%` equals Spark's pmod and `>>` is a logical shift). */
  def bucket(key: Column, seed: Long): Column = {
    val h1 = (key + lit(seed)) * lit(Knuth)
    val h2 = h1.bitwiseXOR(shiftright(h1, 31)).bitwiseAND(lit(Mask31))
    val h3 = h2 * lit(XxPrime)
    pmod(h3.bitwiseXOR(shiftright(h3, 29)), lit(Buckets))
  }

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

  /** Deterministic dataset split assignment — train/val/test by hash
    * band: a document's split is a pure function of (key, seed), so the
    * same row lands in the same split on every run, cluster size, and
    * engine, and splits are DISJOINT by construction (contiguous bucket
    * ranges). `fractions` is ordered; rows past the cumulative fractions
    * get `otherwise` (holdout). Map-only, no shuffle — the assignment is
    * a column, so callers can filter OR keep it as annotation.
    * Quantization is 1/10000 (half-up, like [[keepThreshold]]). */
  def assignSplit(keyCol: Column, fractions: Seq[(String, Double)],
                  otherwise: String = "holdout", seed: Long = 42L): Column = {
    require(fractions.nonEmpty, "at least one split fraction")
    require(fractions.forall(_._2 >= 0.0), "fractions must be >= 0")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions sum to ${fractions.map(_._2).sum} — must be <= 1")
    val names = fractions.map(_._1)
    require(names.distinct.size == names.size && !names.contains(otherwise),
      "split names must be distinct and not collide with the holdout label")
    val b = bucket(keyCol, seed)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail.map(c => math.round(c * Buckets))
    // foldRight nests the when-chain so the FIRST matching (smallest)
    // bound wins — ranges are [prev, bound), disjoint by construction.
    fractions.zip(cum).foldRight(lit(otherwise): Column) {
      case (((name, _), bound), acc) => when(b < bound, lit(name)).otherwise(acc)
    }
  }

  /** Split census: (split, n_docs), ordered — the audit frame. */
  def splitSummary(df: DataFrame, keyCol: String,
                   fractions: Seq[(String, Double)],
                   otherwise: String = "holdout", seed: Long = 42L): DataFrame =
    df.groupBy(assignSplit(col(keyCol), fractions, otherwise, seed).as("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

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
