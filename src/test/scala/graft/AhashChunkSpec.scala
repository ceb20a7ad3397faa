package graft

import org.apache.spark.sql.Row

import graft.ext.Multimodal

/** X5j — window-chunked long-clip audio near-dup: the planted partial
  * overlap, per-segment volume invariance through the codec round
  * trip, the containment gate's exact integer boundary, and the
  * tail-drop / hash-0 / undecodable contracts. */
class AhashChunkSpec extends SparkSpec {

  private lazy val media = Multimodal.ahashChunkMediaFromDocuments(
    Tables.documents(spark, sfDir)).localCheckpoint(true)

  private lazy val chunks = Multimodal.ahashChunks(media, 512)
    .localCheckpoint(true)

  test("family pairs share EXACTLY their 3 planted content segments " +
       "(member 1 a 2x re-gain), cross-family pairs share nothing, and " +
       "the 500000-ppm gate admits exactly the family pairs") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    val sigs = chunks.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(sigs.nonEmpty)
    // Every clip keeps all 6 segments (no degenerate hash-0 plants).
    val perClip = sigs.groupBy(_._1)
    perClip.foreach { case (id, ss) =>
      assert(ss.length == 6, s"clip $id kept ${ss.length} segments")
    }
    // Brute-force containment over the collected signatures equals the
    // engine's pair frame exactly.
    val byClip = perClip.view.mapValues(_.map(_._3).toSet).toMap
    val ids = byClip.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      shared = (byClip(a) intersect byClip(b)).size
      if shared * 2 >= 6 // 500000 ppm of least(6, 6)
    } yield (a, b, shared.toLong)).toSet
    val engineByName = Multimodal.ahashChunkPairs(chunks, 500000L)
      .collect()
      .map(r => (r.getAs[Long]("media_id_a"), r.getAs[Long]("media_id_b"),
        r.getAs[Long]("matched_a"))).toSet
    assert(engineByName == brute,
      s"engine ${engineByName.size} pairs vs brute ${brute.size}")
    // The admitted pairs are exactly the planted families: ids 6f+2
    // with 6f+5, 3 shared segments each.
    engineByName.foreach { case (a, b, m) =>
      assert(b == a + 3 && a % 6 == 2, s"unexpected pair ($a,$b)")
      assert(m == 3L, s"pair ($a,$b) matched $m segments, want 3")
    }
    assert(engineByName.nonEmpty, "fixture must contain family pairs")
    // ...and a stricter gate (4/6) admits none: the boundary is live.
    assert(Multimodal.ahashChunkPairs(chunks, 666667L).count() == 0L)
  }

  test("per-segment hashes of the re-gain member equal the original's " +
       "shared segments bit-for-bit (volume invariance per segment)") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    val sigs = chunks.collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val pairs = sigs.keys.map(_._1).filter(id => id % 6 == 2)
      .filter(id => sigs.contains((id + 3, 0))).toSeq.sorted
    assert(pairs.nonEmpty)
    pairs.foreach { a =>
      (0 until 3).foreach { k =>
        assert(sigs((a, 3 + k)) == sigs((a + 3, k)),
          s"clip $a seg ${3 + k} != clip ${a + 3} seg $k")
      }
    }
  }

  test("the ragged tail is dropped, short/flat segments hash to the " +
       "documented zero and fall out, and undecodable payloads vanish") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    // A 1200-sample clip at segment 512 → 2 full segments, tail 176
    // dropped. Flat (constant) content hashes 0 and is dropped too.
    val n = 1200
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { t =>
      val s = if (t < 512) ((t % 97) - 48) * 30 else 0 // seg2 flat zero
      pcm(2 * t) = (s & 0xFF).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val one = df(Seq(Row(7L, bos.toByteArray), Row(8L, Array[Byte](1, 2)),
        Row(9L, null)),
      "media_id BIGINT, payload BINARY")
    val got = Multimodal.ahashChunks(one, 512).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((7L, 0)),
      s"want only clip 7 segment 0, got ${got.toSeq}")
    intercept[IllegalArgumentException] {
      Multimodal.ahashChunks(one, 64)
    }
  }
}
