package graft

import graft.ext.{Multimodal, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** X5 multimodal plumbing: schema contract, deterministic stubbed decode,
  * partition-batch shape, frame sampling, and composition with the X2
  * similarity operators. */
class MultimodalSpec extends SparkSpec {

  private val media = df(Seq(
    Row(1L, "image", "payload-one".getBytes("UTF-8"),
      Row("png", 64, 64, null, null)),
    Row(2L, "image", "payload-one".getBytes("UTF-8"), // identical payload
      Row("png", 64, 64, null, null)),
    Row(3L, "audio", "a completely different payload".getBytes("UTF-8"),
      Row("wav", null, null, 16000, 2500)),
    Row(4L, "video", "vvv".getBytes("UTF-8"),
      Row("mp4", 640, 480, null, 3500))),
    "media_id BIGINT, kind STRING, payload BINARY, " +
      "meta STRUCT<format: STRING, width: INT, height: INT, sample_rate: INT, duration_ms: INT>")

  test("decodeStub is deterministic, payload-sensitive byte-window means") {
    val a = Multimodal.decodeStub("hello".getBytes, 64)
    val b = Multimodal.decodeStub("hello".getBytes, 64)
    val c = Multimodal.decodeStub("hellp".getBytes, 64)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(Multimodal.decodeStub(Array.emptyByteArray, 8).toSeq ==
      Seq.fill(8)(0.0f))
    // Exact window partition: 5 bytes into 4 windows — [0,1) [1,2) [2,3)
    // [3,5): the last window averages bytes 3 and 4.
    val w = Multimodal.decodeStub(Array[Byte](10, 20, 30, 40, 60), 4)
    assert(w.toSeq == Seq(10.0f, 20.0f, 30.0f, 50.0f))
    // Unsigned byte semantics: 0xFF reads as 255, not -1.
    assert(Multimodal.decodeStub(Array(0xFF.toByte), 1).head == 255.0f)
    // Short payloads leave leading windows empty (byte 0 of n=2 lands in
    // window (1*4-1)/2 = 1).
    assert(Multimodal.decodeStub(Array[Byte](100, 120), 4).toSeq ==
      Seq(0.0f, 100.0f, 0.0f, 120.0f))
  }

  test("extractFeatures preserves ids, fixes dimension, equal payloads → equal features") {
    val feats = Multimodal.extractFeatures(media, dim = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.keySet == Set(1L, 2L, 3L, 4L))
    assert(feats.values.forall(_.length == 32))
    assert(feats(1L) == feats(2L))
    assert(feats(1L) != feats(3L))
  }

  test("extracted features flow into the X2 similarity operator") {
    val feats = Multimodal.extractFeatures(media, dim = 32)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val top = Similarity.bruteForceTopK(feats, feats.filter("vec_id = 1"), k = 1)
      .head()
    assert(top.getLong(2) == 2L)           // the identical payload
    assert(top.getDouble(3) == 1.0)        // cosine 1
  }

  test("sampleFrames explodes video duration into frame references") {
    val frames = Multimodal.sampleFrames(media, frameEveryMs = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(frames.forall(_._1 == 4L)) // only the video row
    assert(frames.map(_._2).toSeq == Seq(0, 1, 2)) // 3500ms → 3 frames
    assert(frames.map(_._3).toSeq == Seq(0L, 1000L, 2000L))
  }

  test("integritySummary counts null and truncated payloads per kind") {
    val withBad = media.union(df(Seq(
      Row(5L, "image", null, Row("png", 1, 1, null, null)),
      Row(6L, "audio", "tiny".getBytes("UTF-8"), Row("wav", null, null, 1, 1))),
      media.schema.toDDL))
    val s = Multimodal.integritySummary(withBad)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // ANSI ternary: length(NULL) is NULL, so a null payload is counted by
    // null_payload but NOT by truncated — the two metrics are disjoint.
    assert(s("image") == ((1L, 0L)))
    assert(s("audio")._2 == 1L) // "tiny" is 4 bytes
  }

  test("syntheticMediaFromDocuments matches the media schema contract") {
    val synth = Multimodal.syntheticMediaFromDocuments(Tables.documents(spark, sfDir))
    assert(synth.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload", "meta"))
    assert(synth.select("kind").distinct().count() == 3)
    assert(synth.count() == Tables.documents(spark, sfDir).count())
  }

  test("header round-trip: parsed bytes equal the declared meta for every row") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.syntheticMediaWithHeaders(Tables.documents(spark, sfDir))
    val parsed = Multimodal.parseHeaders(media)
    val joined = media.select(col("media_id"), col("meta.*"))
      .join(parsed.withColumnRenamed("format", "pformat")
        .withColumnRenamed("width", "pwidth")
        .withColumnRenamed("height", "pheight")
        .withColumnRenamed("sample_rate", "prate")
        .withColumnRenamed("duration_ms", "pdur"), "media_id")
    val mismatches = joined.filter(
      !(col("format") <=> col("pformat")) ||
        !(col("width") <=> col("pwidth")) ||
        !(col("height") <=> col("pheight")) ||
        !(col("sample_rate") <=> col("prate")) ||
        !(col("duration_ms").cast("long") <=> col("pdur"))).count()
    assert(mismatches == 0)
  }

  test("parseOne handles corrupt and truncated payloads without throwing") {
    import graft.ext.Multimodal.parseOne
    assert(parseOne(1L, null).format == "unknown")
    assert(parseOne(2L, Array[Byte](1, 2, 3)).format == "unknown")
    assert(parseOne(3L, "just some text bytes".getBytes).format == "unknown")
    // A PNG signature with a truncated IHDR must not crash.
    val sigOnly = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    assert(parseOne(4L, sigOnly).format == "unknown")
    // An ftyp with a lying box size must degrade to format-only mp4.
    val badBox = Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p',
      'i', 's', 'o', 'm', 0, 0, 0, 0, /* moov with absurd size */
      0x7F, -1, -1, -1, 'm', 'o', 'o', 'v')
    val mp4 = parseOne(5L, badBox)
    assert(mp4.format == "mp4" && mp4.duration_ms.isEmpty)
  }

  test("mvhd decode: v1 yields null duration; unsigned 32-bit duration stays positive") {
    import graft.ext.Multimodal.parseOne
    def mp4With(version: Byte, timescale: Long, duration: Long): Array[Byte] = {
      def be(v: Long) = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      val ftyp = be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0)
      val mvhdBody = Array(version, 0, 0, 0).map(_.toByte) ++
        be(0) ++ be(0) ++ be(timescale) ++ be(duration) ++ new Array[Byte](80)
      val mvhd = be(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
      val moov = be(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
      ftyp ++ moov
    }
    // v1 mvhd has different field offsets — must NOT decode as v0.
    val v1 = parseOne(1L, mp4With(1, 1000L, 5000L))
    assert(v1.format == "mp4" && v1.duration_ms.isEmpty)
    // Unsigned duration >= 2^31: a ~7h clip at timescale 90000.
    val big = parseOne(2L, mp4With(0, 90000L, 2268000000L))
    assert(big.duration_ms.contains(2268000000L * 1000L / 90000L))
  }

  test("PNG codec round trip: encoded formula decodes to closed-form sums") {
    assume(Multimodal.pngSupported, "JDK without a PNG ImageIO plugin")
    val id = 7L
    val (w, h) = (32 + (id % 64).toInt, 32 + (id % 32).toInt)
    val bytes = Multimodal.pngPayload(id, w, h)
    // Genuinely compressed bitstream, not a header stub.
    assert(bytes.length > 8 && new String(bytes.slice(1, 4), "US-ASCII") == "PNG")
    val d = Multimodal.decodePngOne(id, bytes)
    def expect(mul: Long): Long =
      (0 until h).map(y => w.toLong * ((mul * id + y) % 256)).sum
    assert(d.png_w.contains(w) && d.png_h.contains(h))
    assert(d.sum_r.contains(expect(1)) && d.sum_g.contains(expect(2)) &&
      d.sum_b.contains(expect(3)))
    // Corrupt payload is data, not a crash.
    assert(Multimodal.decodePngOne(id, bytes.take(20)).png_w.isEmpty)
    assert(Multimodal.decodePngOne(id, null).png_w.isEmpty)
  }

  test("WAV codec round trip: encoded PCM decodes to closed-form sample sum") {
    assume(Multimodal.wavSupported, "JDK without a WAVE audio plugin")
    val id = 13L
    val n = (256 + id % 256).toInt
    val rate = (8000 + (id % 4) * 4000).toInt
    val bytes = Multimodal.wavPayload(id, n, rate)
    // A real RIFF/WAVE container, not a header stub.
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
      new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    // ...and the existing header parser agrees on the sample rate.
    assert(Multimodal.parseOne(id, bytes).sample_rate.contains(rate))
    val d = Multimodal.decodeWavOne(id, bytes)
    val expect = (0 until n).map(t => ((id * 31L + 7L * t) % 2003L) - 1001L).sum
    assert(d.sample_rate.contains(rate))
    assert(d.n_samples.contains(n.toLong))
    assert(d.sum_samples.contains(expect))
    // Corrupt payload is data, not a crash.
    assert(Multimodal.decodeWavOne(id, bytes.take(16)).n_samples.isEmpty)
    assert(Multimodal.decodeWavOne(id, null).n_samples.isEmpty)
  }

  test("GIF codec round trip: every frame of the animated payload " +
       "decodes to the closed-form palette sums") {
    assume(Multimodal.gifSupported, "JDK without a GIF plugin")
    val id = 23L
    val (w, h, nf) = ((16 + id % 32).toInt, (16 + id % 16).toInt,
      (1 + id % 4).toInt)
    val bytes = Multimodal.gifPayload(id, w, h, nf)
    // A real GIF container (GIF89a/GIF87a signature).
    assert(new String(bytes.take(3), "US-ASCII") == "GIF")
    val frames = Multimodal.decodeGifOne(id, bytes)
    assert(frames.size == nf, s"expected $nf frames, got ${frames.size}")
    frames.foreach { fr =>
      val f = fr.frame_idx
      def ch(mul: Int): Long = (0 until h).map { y =>
        val idx = ((id + 17L * f + y) % 64).toInt
        w.toLong * ((idx * mul) % 256)
      }.sum
      assert(fr.gif_w.contains(w) && fr.gif_h.contains(h))
      assert(fr.sum_r.contains(ch(3)), s"frame $f red sum")
      assert(fr.sum_g.contains(ch(5)) && fr.sum_b.contains(ch(7)))
    }
    // Corrupt payload is data, not a crash.
    assert(Multimodal.decodeGifOne(id, bytes.take(10)).head.gif_w.isEmpty)
    assert(Multimodal.decodeGifOne(id, null).head.gif_w.isEmpty)
  }
}
