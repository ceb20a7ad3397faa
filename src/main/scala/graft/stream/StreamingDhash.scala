package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** s19/s21 — streaming IMAGE near-dup drop against a persisted
  * perceptual-hash signature index (the image analog of the s3/s4 text
  * drop streams, with one decisive upgrade: dHash and pHash are both
  * DETERMINISTIC, so these are streaming near-dup lanes whose batch
  * replay carries a FULL DuckDB oracle instead of the
  * rows-only/planted-twin contract).
  *
  * Shape: arriving (media_id, payload) rows decode + hash per row in
  * one stateless mapPartitions (the codec batch shape — no aggregation,
  * no state store, no watermark), then survive a fold of
  * `maxHamming + 1` stream-static LEFT ANTI joins against the saved
  * (media_id, sig) parquet — one per pigeonhole band, each keyed on
  * a pure-left bucket expression (hash-joinable) and carrying the
  * exact `bit_count(xor) ≤ maxHamming` verify as its non-equi
  * condition, so a bucket collision alone never drops an image. Band
  * layout is [[graft.ext.Dedup.simhashBandBucket]] — the ONE
  * definition shared with the batch pair joins, so the index can never
  * be sliced differently on the probe side. The fold is GENERIC over
  * the signature column ([[dropStreamAgainst]] — VERDICT r15 next #3:
  * one drop machine, per-signature decode bodies), so a new 64-bit
  * signature family costs one nullable hasher, never a re-derived
  * join plan.
  *
  * Undecodable payloads hash to NULL and always survive: corrupt media
  * is data for a later integrity gate, not something a DEDUP stage may
  * silently eat (the s3/s4 null-signature contract). */
object StreamingDhash {

  private def sigSchema(sigCol: String) = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField(sigCol, LongType, nullable = true)))

  /** Per-row decode+hash that KEEPS undecodable rows (null signature)
    * — the drop-stream needs them to survive, where the batch pair
    * lanes rightly drop them (a null signature can never pair). Works
    * on batch AND streaming frames (stateless). `hash` must be the ONE
    * shared per-payload body of the signature family so a codec fix
    * can never land on one side only. */
  private def hashNullable(media: DataFrame, sigCol: String,
      hash: Array[Byte] => java.lang.Long): DataFrame = {
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(sigSchema(sigCol))
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), hash(r.getAs[Array[Byte]](1))))
      }(encoder)
  }

  /** dHash decode+hash, null-keeping ([[graft.ext.Multimodal
    * .decodeDhash]] — the one body shared with [[graft.ext.Multimodal
    * .dhashPngs]]). */
  def dhashNullable(media: DataFrame): DataFrame =
    hashNullable(media, "dhash", graft.ext.Multimodal.decodeDhash)

  /** pHash decode+hash, null-keeping ([[graft.ext.Multimodal
    * .decodePhash]] — the one body shared with [[graft.ext.Multimodal
    * .phashImages]]; format-agnostic, so mixed-container arrivals hash
    * through the same path). */
  def phashNullable(media: DataFrame): DataFrame =
    hashNullable(media, "phash", graft.ext.Multimodal.decodePhash)

  /** Survivors of a signed frame against the saved history signature
    * index: rows with no history signature within `maxHamming` of
    * `sigCol` (null signatures always survive — every anti-join key is
    * null). Signature-agnostic: both frames carry 64-bit signatures in
    * `sigCol`, banded by the ONE shared pigeonhole layout. */
  def dropStreamAgainst(withSig: DataFrame, historySigs: DataFrame,
                        sigCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    (0 to maxHamming).foldLeft(withSig) { (acc, b) =>
      val hb = historySigs.select(col(sigCol).as("__hh"),
        graft.ext.Dedup.simhashBandBucket(col(sigCol), b, maxHamming)
          .as("__hbucket"))
      acc.join(hb,
        graft.ext.Dedup.simhashBandBucket(col(sigCol), b, maxHamming)
          === col("__hbucket") &&
          bit_count(col(sigCol).bitwiseXOR(col("__hh"))) <= maxHamming,
        "left_anti")
    }
  }

  /** aHash decode+hash, null-keeping ([[graft.ext.Multimodal
    * .decodeAhash]] — the one body shared with [[graft.ext.Multimodal
    * .ahashWavs]]): the AUDIO arrival lane. */
  def ahashNullable(media: DataFrame): DataFrame =
    hashNullable(media, "ahash", graft.ext.Multimodal.decodeAhash)

  /** s23 — survivors of an AUDIO stream against the saved aHash index:
    * the third consumer of [[dropStreamAgainst]] — a re-gained copy of
    * an indexed clip drops (the signature is volume-invariant), where
    * byte-fingerprint dedup would admit it. Output: (media_id, ahash). */
  def ahashDropStreamAgainst(stream: DataFrame, historySigs: DataFrame,
                             maxHamming: Int = 3): DataFrame =
    dropStreamAgainst(ahashNullable(stream), historySigs, "ahash",
      maxHamming)

  /** s19 — survivors of `stream` (media_id, payload) against the saved
    * dHash index. Output: (media_id, dhash). */
  def dhashDropStreamAgainst(stream: DataFrame, historySigs: DataFrame,
                             maxHamming: Int = 3): DataFrame =
    dropStreamAgainst(dhashNullable(stream), historySigs, "dhash",
      maxHamming)

  /** s21 — survivors of `stream` (media_id, payload) against the saved
    * pHash index: the re-compression-robust drop gate (a JPEG re-save
    * of an indexed image still drops, where dHash's gradient signs
    * drift). Output: (media_id, phash). */
  def phashDropStreamAgainst(stream: DataFrame, historySigs: DataFrame,
                             maxHamming: Int = 2): DataFrame =
    dropStreamAgainst(phashNullable(stream), historySigs, "phash",
      maxHamming)
}
