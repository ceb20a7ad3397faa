package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom pre-filter over a history key index — the anti-join probe
  * reducer for the incremental-dedup family.
  *
  * At nightly-pipeline scale the cross-shard anti join
  * ([[Dedup.exactDedupAgainst]]) shuffles the ENTIRE new shard on the
  * fingerprint even though, on real corpora, the overwhelming majority
  * of its rows match nothing in history. A Bloom filter built over the
  * history keys decides "definitively new" MAP-SIDE: a bloom-negative
  * row cannot be in history (no false negatives) and skips the join
  * entirely; only bloom-positive rows — true matches plus the chosen
  * false-positive fraction — enter the shuffle, which the exact anti
  * join then verifies. Results are bit-identical to the plain path by
  * construction, whatever the false-positive rate (pinned by
  * DedupSpec parity and the shared `x1_incremental_dedup` oracle).
  *
  * The sketch's size is FIXED by (expectedItems, fpp) at build time —
  * `-n·ln(fpp)/ln²2` bits, e.g. ~1.2 GB for 10⁹ keys at 1% — and is
  * INDEPENDENT of the history row count, so the driver fetch in
  * [[build]] is a bounded read of a chosen-size artifact (the D5
  * guarded-fetch shape), not an unbounded collect. A nightly pipeline
  * builds the sketch once per index roll and ships the bytes alongside
  * the fingerprint parquet; every executor then evaluates the probe as
  * a codegen'd scalar against the broadcast bytes.
  *
  * Build and probe MUST hash identically — both sides go through
  * `xxhash64(key)` (seed 42, the engine-wide family) and the sketch's
  * `putLong`/`mightContainLong`, one definition on each side of the
  * persistence boundary (the [[Dedup.simhashBandBucket]] discipline).
  */
object BloomIndex {

  /** Build the sketch over `keyCol` of the history index: one
    * partial-agg pass (per-partition sketches OR-merge — a
    * TypedImperativeAggregate, so history never concentrates), then
    * one guarded driver fetch of the fixed-size bytes.
    *
    * Note Spark clamps the aggregate's parameters to
    * `spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}`
    * (defaults 4M items / 8 MB); raise those confs when sizing for a
    * multi-billion-key history. */
  def build(history: DataFrame, keyCol: String = "fp",
            expectedItems: Long = 1000000L, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp in (0, 1)")
    // Closed-form optimal size (the sketch's own -n·ln p / ln²2,
    // rounded up to whole 64-bit words as its BitArray does) — NOT
    // `BloomFilter.create(...).bitSize()`, which would materialize the
    // full bit array on the driver (~1.2 GB at 10⁹ keys / 1% fpp) just
    // to read its length.
    val rawBits =
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    require(rawBits > 0, s"degenerate sketch ($expectedItems items @ $fpp)")
    val numBits = ((rawBits + 63) / 64) * 64
    val agg = new BloomFilterAggregate(
      expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits), 0, 0)
    val bytes = history
      .select(column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    if (bytes != null) bytes
    else { // empty history: an all-negative sketch of the same family
      val out = new java.io.ByteArrayOutputStream()
      BloomFilter.create(expectedItems, fpp).writeTo(out)
      out.toByteArray
    }
  }

  /** Probe column: true iff `key` MIGHT be in the index the bytes were
    * built over; false is a GUARANTEE of absence. Never null — a null
    * key hashes like the build side would have hashed it, and the
    * exact join downstream owns null semantics either way. Codegen'd
    * scalar (`BloomFilterMightContain`), no join, no shuffle. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(expression(key)))))
}
