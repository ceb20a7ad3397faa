package graft

import graft.ext.Multimodal
import org.apache.spark.sql.Row

/** X5f — IMA-ADPCM codec: state-machine clamps, container parsing
  * (chunk walk, fact cap, word-aligned odd chunks), per-block state
  * restart, and end-to-end parity of the byte-level decoder against an
  * independent nibble-level reference decode. */
class AdpcmSpec extends SparkSpec {

  /** Reference decode: feeds nibbles straight to the state machine —
    * no byte parsing shared with decodeAdpcmOne's container walk. */
  private def reference(p0: Int, i0: Int, nibs: Seq[Int]): Seq[Int] = {
    var pred = p0; var idx = i0
    p0 +: nibs.map { nib =>
      val (p, i) = Multimodal.imaStep(pred, idx, nib)
      pred = p; idx = i
      pred
    }
  }

  test("imaStep clamps the predictor to int16 and the index to [0, 88]") {
    // Max step (index 88, step 32767), magnitude-7 nibble from 32000:
    // unclamped 32000 + 32767 + 16383 + 8191 + 4095 overflows int16.
    val (pHi, iHi) = Multimodal.imaStep(32000, 88, 7)
    assert(pHi === 32767)
    assert(iHi === 88) // index 88 + 8 clamps back to 88
    val (pLo, iLo) = Multimodal.imaStep(-32000, 88, 15)
    assert(pLo === -32768)
    assert(iLo === 88)
    // Nibble 0 at index 0: index -1 clamps to 0; diff = 7>>3 = 0.
    val (p0, i0) = Multimodal.imaStep(5, 0, 0)
    assert(p0 === 5 && i0 === 0)
  }

  test("container decode matches the independent reference, odd and even n") {
    for (id <- Seq(1L, 4L, 7L, 10L, 64L, 127L)) {
      val n = (64 + id % 64).toInt
      val p0 = ((id * 97) % 2048 - 1024).toInt
      val i0 = (id % 89).toInt
      val payload = Multimodal.adpcmPayload(id, n, 8000, p0, i0)
      val got = Multimodal.decodeAdpcmOne(id, payload)
      val nibs = (1L until n.toLong).map(Multimodal.adpcmNibble(id, _))
      val ref = reference(p0, i0, nibs)
      assert(ref.length === n)
      assert(got.n_samples === Some(n.toLong), s"id=$id")
      assert(got.sample_rate === Some(8000))
      assert(got.sum_samples === Some(ref.map(_.toLong).sum), s"id=$id")
      assert(got.sum_weighted ===
        Some(ref.zipWithIndex.map { case (s, t) => s.toLong * (t + 1) }.sum))
    }
  }

  /** Hand-built two-block container: blockAlign 8 → 9 samples/block;
    * fact n = 12 → block 2 emits its header + 2 nibbles and stops,
    * leaving 6 encoded nibbles unconsumed. */
  private def twoBlockPayload(nibs1: Seq[Int], nibs2: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int) = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    def nibBytes(ns: Seq[Int]) =
      ns.grouped(2).foreach(g => out.write(g.head | (g.lift(1).getOrElse(0) << 4)))
    out.write("RIFF".getBytes); le32(4 + 28 + 12 + 8 + 16)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(20)
    le16(0x0011); le16(1); le32(8000); le32(8000); le16(8); le16(4)
    le16(2); le16(9) // cbSize, samplesPerBlock
    out.write("fact".getBytes); le32(4); le32(12)
    out.write("data".getBytes); le32(16)
    le16(100 & 0xFFFF); out.write(10); out.write(0); nibBytes(nibs1)
    le16((-200) & 0xFFFF); out.write(5); out.write(0); nibBytes(nibs2)
    out.toByteArray
  }

  test("block boundary restarts predictor/index from the block header") {
    val nibs1 = Seq(4, 2, 7, 0, 12, 3, 9, 1)
    val nibs2 = Seq(6, 6, 6, 6, 6, 6, 6, 6)
    val got = Multimodal.decodeAdpcmOne(99L, twoBlockPayload(nibs1, nibs2))
    // Reference: block 1 = header 100 @ idx 10 + 8 nibbles (9 samples);
    // block 2 RESTARTS at header -200 @ idx 5 and emits only 3 samples
    // (fact = 12) — the unconsumed nibbles must not decode.
    val ref = reference(100, 10, nibs1) ++ reference(-200, 5, nibs2.take(2))
    assert(got.n_samples === Some(12L))
    assert(got.sum_samples === Some(ref.map(_.toLong).sum))
    assert(got.sum_weighted ===
      Some(ref.zipWithIndex.map { case (s, t) => s.toLong * (t + 1) }.sum))
  }

  test("malformed payloads decode to the all-null row, never throw") {
    def isNone(b: Array[Byte]) = {
      val d = Multimodal.decodeAdpcmOne(0L, b)
      d.sample_rate.isEmpty && d.n_samples.isEmpty &&
        d.sum_samples.isEmpty && d.sum_weighted.isEmpty
    }
    assert(isNone(null))
    assert(isNone(Array[Byte](1, 2, 3)))
    // A PCM (tag 1) WAV is a VALID WAV but not ADPCM — must refuse.
    assert(isNone(Multimodal.wavPayload(7L, 32, 8000)))
    // Truncation mid-data: chunk length now overruns the buffer.
    val ok = Multimodal.adpcmPayload(3L, 67, 8000, 0, 3)
    assert(isNone(ok.take(ok.length - 5)))
    // Step index out of table range in the block header.
    val bad = ok.clone()
    // data chunk header is at a fixed offset: RIFF(12) + fmt(28) +
    // fact(12) = 52; block starts at 60; index byte at 62.
    assert(ok(60 + 2) === 3.toByte)
    bad(62) = 89.toByte
    assert(isNone(bad))
  }

  test("decodeAdpcms over a frame: planted lane decodes fully, junk nulls") {
    val docs = df((0L until 30L).map(i => Row(i, s"d$i")),
      "doc_id BIGINT, text STRING")
    val media = Multimodal.adpcmMediaFromDocuments(docs)
    assert(media.count() === 10L) // doc_id % 3 == 1
    val dec = Multimodal.decodeAdpcms(media)
    assert(dec.count() === 10L)
    assert(dec.filter("sum_samples IS NULL").count() === 0L)
    val junk = df(Seq(Row(5L, Array[Byte](0, 1, 2))),
      "media_id BIGINT, payload BINARY")
    val nulls = Multimodal.decodeAdpcms(junk).collect()
    assert(nulls.length === 1 && nulls.head.isNullAt(1))
  }
}
