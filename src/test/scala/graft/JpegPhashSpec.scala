package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** X5g — the JPEG codec lane and the DCT perceptual hash.
  *
  * JPEG is lossy, so the decode pin is a TOLERANCE claim (block-mean
  * fidelity on block-constant plants at explicit q0.95), measured here
  * tighter than the registered lane's ±3; the pHash pins are EXACT
  * (all-integer hash) — determinism, brute-force pair recall, and the
  * cross-codec stability claim that motivates pHash next to dHash. */
class JpegPhashSpec extends SparkSpec {

  private def jpegMedia = Multimodal.jpegMediaFromDocuments(
    Tables.documents(spark, sfDir))

  test("JPEG round trip: every planted payload decodes at exact dims " +
       "with MCU-block means within the registered ±3 tolerance") {
    assume(Multimodal.jpegSupported, "JVM ships no JPEG codec")
    val rows = Multimodal.decodeJpegs(jpegMedia).collect()
    assert(rows.nonEmpty)
    var worst = 0L
    rows.foreach { r =>
      val id = r.getLong(0)
      val q = id / 3
      assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3),
        s"media $id failed to decode")
      val w = r.getInt(1)
      val h = r.getInt(2)
      assert(w == 16 + 8 * (q % 3) && h == 16 + 8 * (q % 2),
        s"media $id dims ${w}x$h diverge from the plant")
      val sums = r.getSeq[Long](3)
      val bw = w / 8
      sums.zipWithIndex.foreach { case (s, i) =>
        val expect = 64L * Multimodal.jpegBlockLuma(id, i % bw, i / bw)
        worst = math.max(worst, math.abs(s - expect))
      }
    }
    // Block-mean error = worst/64; the registered lane allows 3.
    assert(worst <= 3 * 64,
      s"worst block-sum error $worst exceeds the ±3-mean tolerance")
  }

  test("pHash is deterministic and identical payloads hash identically") {
    assume(Multimodal.pngSupported, "JVM ships no PNG codec")
    val media = Multimodal.phashMediaFromDocuments(
      Tables.documents(spark, sfDir))
    val sigs = Multimodal.phashImages(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.nonEmpty)
    val again = Multimodal.phashImages(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == again, "pHash must be bit-deterministic")
    // vp=6 and vp=7 members are byte-identical payloads → equal hashes.
    val planted = sigs.keys.groupBy(_ / 24).values
      .flatMap { fam =>
        val v6 = fam.find(id => (id % 24) / 3 == 6)
        val v7 = fam.find(id => (id % 24) / 3 == 7)
        for (a <- v6; b <- v7) yield (a, b)
      }
    assert(planted.nonEmpty, "fixture must contain a vp=6/7 pair")
    planted.foreach { case (a, b) =>
      assert(sigs(a) == sigs(b), s"identical payloads $a/$b hash apart")
    }
  }

  test("banded pair join equals the brute-force Hamming predicate " +
       "on pHash signatures") {
    assume(Multimodal.pngSupported, "JVM ships no PNG codec")
    val sigFrame = Multimodal.phashImages(
      Multimodal.phashMediaFromDocuments(Tables.documents(spark, sfDir)))
    val sigs = sigFrame.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ka, ha) <- sigs; (kb, hb) <- sigs if ka < kb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (ka, kb, d)).toSet
    val banded = Dedup.hammingPairs(sigFrame, "media_id", "phash",
        maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs vs brute ${brute.size}")
    assert(brute.exists(_._3 == 0), "the Hamming-0 plant must surface")
  }

  test("cross-codec stability: pHash of a JPEG re-encode lands within " +
       "a few bits of the lossless original (the re-compression claim)") {
    assume(Multimodal.jpegSupported && Multimodal.pngSupported,
      "JVM ships no JPEG/PNG codec")
    // Same pixels, two containers: the planted block-constant image as
    // a lossless PNG and as the q0.95 JPEG the corpus carries.
    val ids = Seq(3L, 9L, 27L, 60L, 123L)
    ids.foreach { id =>
      val q = id / 3
      val w = (16 + 8 * (q % 3)).toInt
      val h = (16 + 8 * (q % 2)).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val l = Multimodal.jpegBlockLuma(id, x / 8, y / 8)
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val png = Multimodal.decodePhash(bos.toByteArray)
      val jpg = Multimodal.decodePhash(Multimodal.jpegPayload(id, w, h))
      assert(png != null && jpg != null)
      val d = java.lang.Long.bitCount(png.longValue ^ jpg.longValue)
      assert(d <= 6,
        s"pHash drifted $d bits across the JPEG re-encode of media $id")
    }
  }
}
