package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** s19 — streaming IMAGE near-dup drop against a persisted dHash
  * signature index (the image analog of the s3/s4 text drop streams,
  * with one decisive upgrade: dHash is DETERMINISTIC, so this is the
  * first streaming near-dup lane whose batch replay carries a FULL
  * DuckDB oracle instead of the rows-only/planted-twin contract).
  *
  * Shape: arriving (media_id, payload) rows decode + hash per row in
  * one stateless mapPartitions (the codec batch shape — no aggregation,
  * no state store, no watermark), then survive a fold of
  * `maxHamming + 1` stream-static LEFT ANTI joins against the saved
  * (media_id, dhash) parquet — one per pigeonhole band, each keyed on
  * a pure-left bucket expression (hash-joinable) and carrying the
  * exact `bit_count(xor) ≤ maxHamming` verify as its non-equi
  * condition, so a bucket collision alone never drops an image. Band
  * layout is [[graft.ext.Dedup.simhashBandBucket]] — the ONE
  * definition shared with the batch pair joins, so the index can never
  * be sliced differently on the probe side.
  *
  * Undecodable payloads hash to NULL and always survive: corrupt media
  * is data for a later integrity gate, not something a DEDUP stage may
  * silently eat (the s3/s4 null-signature contract). */
object StreamingDhash {

  private val sigSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = true)))

  /** Per-row decode+hash that KEEPS undecodable rows (null dhash) —
    * the drop-stream needs them to survive, where the batch pair lanes
    * ([[graft.ext.Multimodal.dhashPngs]]) rightly drop them (a null
    * signature can never pair). Works on batch AND streaming frames
    * (stateless). */
  def dhashNullable(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(sigSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // ONE decode body with the batch pair lanes (Multimodal
          // .decodeDhash) — only the null handling differs here.
          Row(r.getLong(0),
            graft.ext.Multimodal.decodeDhash(r.getAs[Array[Byte]](1)))
        }
      }(encoder)
  }

  /** Survivors of `stream` (media_id, payload) against the saved
    * history signature index: rows with no history image within
    * `maxHamming`. Output: (media_id, dhash). */
  def dhashDropStreamAgainst(stream: DataFrame, historySigs: DataFrame,
                             maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val withSig = dhashNullable(stream)
    (0 to maxHamming).foldLeft(withSig) { (acc, b) =>
      val hb = historySigs.select(col("dhash").as("__hh"),
        graft.ext.Dedup.simhashBandBucket(col("dhash"), b, maxHamming)
          .as("__hbucket"))
      acc.join(hb,
        graft.ext.Dedup.simhashBandBucket(col("dhash"), b, maxHamming)
          === col("__hbucket") &&
          bit_count(col("dhash").bitwiseXOR(col("__hh"))) <= maxHamming,
        "left_anti")
    }
  }
}
