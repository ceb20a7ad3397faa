package graft

import org.apache.spark.sql.Row

import graft.ext.{Dedup, Multimodal}

/** X5i — the energy-profile audio perceptual hash: determinism through
  * the REAL WAV codec round trip, the exact volume-invariance claim,
  * banded-vs-brute-force parity, and the planted re-gain class. */
class AhashSpec extends SparkSpec {

  private lazy val media = Multimodal.ahashMediaFromDocuments(
    Tables.documents(spark, sfDir)).localCheckpoint(true)

  private lazy val sigs: Array[(Long, Long)] =
    Multimodal.ahashWavs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("aHash is deterministic through the codec round trip and " +
       "exactly VOLUME-INVARIANT") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    assert(sigs.nonEmpty)
    val again = Multimodal.ahashWavs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sigs.toSeq == again.toSeq, "aHash must be bit-deterministic")
    // Direct invariance: any clip vs its g-scaled copy, several gains.
    val samples = Array.tabulate(700)(t =>
      Multimodal.ahashSample(3L, 2, t.toLong))
    val h = Multimodal.ahash64(samples)
    Seq(2, 3, 7).foreach { g =>
      assert(Multimodal.ahash64(samples.map(_ * g)) == h,
        s"gain x$g changed the hash")
    }
    // The planted re-gain pair: v=6 is the EXACT 2x copy of v=5 —
    // byte-different payloads, identical hashes, in every family that
    // carries both.
    val byId = sigs.toMap
    val pairs = sigs.map(_._1).filter(id => (id % 21) / 3 == 5)
      .flatMap(id5 => byId.get(id5 + 3).map(h6 => (id5, byId(id5), h6)))
    assert(pairs.nonEmpty, "fixture must contain a v=5/v=6 pair")
    pairs.foreach { case (id5, h5, h6) =>
      assert(h5 == h6, s"re-gain of $id5 hashed apart")
    }
    val payloads = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    pairs.foreach { case (id5, _, _) =>
      assert(!java.util.Arrays.equals(payloads(id5), payloads(id5 + 3)),
        "the re-gain plant must be byte-DIFFERENT")
    }
  }

  test("banded pair join equals the brute-force Hamming predicate " +
       "and the threshold is non-trivial") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    val brute = (for {
      (ka, ha) <- sigs; (kb, hb) <- sigs if ka < kb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ka, kb, d)).toSet
    val banded = Dedup.hammingPairs(Multimodal.ahashWavs(media),
        "media_id", "ahash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs vs brute ${brute.size}")
    assert(brute.exists(_._3 == 0), "the re-gain Hamming-0 class must surface")
    assert(brute.exists(_._3 > 0), "near (not only exact) pairs must surface")
    // ...and not every clip pairs: the threshold separates.
    val dropped = brute.map(_._2)
    assert(dropped.size < sigs.length, "some clip must survive")
  }

  test("undecodable payloads drop out of the signature frame; clips " +
       "shorter than the window grid hash to the documented zero") {
    val junk = df(Seq(
      Row(900L, Array[Byte](1, 2, 3)),
      Row(901L, null)),
      "media_id BIGINT, payload BINARY")
    assert(Multimodal.ahashWavs(junk).count() === 0L)
    assert(Multimodal.ahash64(Array.fill(64)(5)) == 0L)
  }
}
