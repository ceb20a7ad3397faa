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

  test("past the 6 M-sample Long-overflow bound the 128-bit compare " +
       "stays EXACT: volume invariance holds and every bit matches a " +
       "BigInt reference") {
    // 7 M samples ≈ 2.6 min at 44.1 kHz — past the scaladoc's ≈6 M
    // bound where e_w·c wraps a signed long. Full-scale ±32767-class
    // samples maximize window energies so the raw long product would
    // genuinely overflow (pinned below), then the exact path must (a)
    // keep the re-gain invariance and (b) agree bit-for-bit with
    // unbounded-integer arithmetic.
    val n = 7000000
    val samples = Array.tabulate(n) { t =>
      val x = (t.toLong * 2654435761L) ^ (t.toLong >>> 7)
      val mag = 16000 + math.abs((x % 381L).toInt) // 16000..16380
      if (((x >>> 13) & 1L) == 0L) mag else -mag   // 2x-gain int16-safe
    }
    val h = Multimodal.ahash64(samples)
    assert(Multimodal.ahash64(samples.map(_ * 2)) == h,
      "gain x2 changed the hash on a >6M-sample clip")
    // BigInt reference: same pooling, unbounded comparison.
    val e = new Array[BigInt](65); val c = new Array[Long](65)
    java.util.Arrays.fill(c, 0L)
    (0 until 65).foreach(w => e(w) = BigInt(0))
    var t = 0
    while (t < n) {
      val w = (t.toLong * 65L / n).toInt
      e(w) += BigInt(samples(t).toLong * samples(t).toLong)
      c(w) += 1; t += 1
    }
    var ref = 0L
    (0 until 64).foreach { w =>
      if (e(w) * c(w + 1) < e(w + 1) * c(w)) ref |= 1L << w
    }
    assert(h == ref, "ahash64 diverged from the unbounded-integer reference")
    // ...and the case is non-vacuous: on the 2x-gained clip (energies
    // 4x) at least one boundary's raw long cross-product genuinely
    // wraps (hi word nonzero) — the old signed-long compare would have
    // read garbage exactly where invariance was asserted above.
    val eL = new Array[Long](65)
    t = 0
    while (t < n) {
      val w = (t.toLong * 65L / n).toInt
      val s2 = samples(t).toLong * 2L
      eL(w) += s2 * s2; t += 1
    }
    def wraps(a: Long, b: Long): Boolean = // true 128-bit product >= 2^63
      Math.multiplyHigh(a, b) != 0L || a * b < 0L
    assert((0 until 64).exists(w =>
      wraps(eL(w), c(w + 1)) || wraps(eL(w + 1), c(w))),
      "fixture too small to exercise the overflow path")
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
