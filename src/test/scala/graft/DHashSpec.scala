package graft

import graft.ext.{Dedup, Multimodal}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** X5e — image perceptual-hash near-dup: dHash invariants (exact
  * nearest-neighbor scale invariance, tie handling), the planted-corpus
  * contract (byte-identical plants, |Δvariant| Hamming ladder), and
  * drop-set parity of the banded pair join against the brute-force
  * Hamming predicate. */
class DHashSpec extends SparkSpec {

  private def grayImage(w: Int, h: Int)(l: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = l(x, y) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def upscale(img: java.awt.image.BufferedImage, sx: Int, sy: Int) =
    grayImage(img.getWidth * sx, img.getHeight * sy)(
      (x, y) => img.getRGB(x / sx, y / sy) & 0xFF)

  test("dhash64 is exactly invariant under nearest-neighbor upscaling") {
    // Pseudo-random 9x8 base (1 px per grid cell), then 2x3 and 4x1
    // replication: every cell's mean is preserved exactly, so the
    // cross-multiplied comparisons — and the hash — cannot move.
    val base = grayImage(9, 8)((x, y) => (x * 53 + y * 91 + 17) % 256)
    val h0 = Multimodal.dhash64(base)
    assert(Multimodal.dhash64(upscale(base, 2, 3)) === h0)
    assert(Multimodal.dhash64(upscale(base, 4, 1)) === h0)
    assert(h0 !== 0L) // the base is not degenerate
  }

  test("a flat image ties every comparison and hashes to 0") {
    assert(Multimodal.dhash64(grayImage(27, 16)((_, _) => 131)) === 0L)
  }

  test("dhash64 uses mean, not sum: unequal cell pixel counts") {
    // w=10 over 9 columns: cell gx=0 holds TWO pixel columns (x=0,1;
    // x*9/10 = 0 for both), the rest one. With l(0)=l(1)=60 and
    // l(2)=102, cell 0 SUMS brighter (120 > 102) but MEANS darker
    // (60 < 102): the cross-multiplied mean comparison must set bit 0.
    val img = grayImage(10, 8)((x, _) => if (x <= 1) 60 else 100 + x)
    val h = Multimodal.dhash64(img)
    for (gy <- 0 until 8)
      assert(((h >> (gy * 8)) & 1L) === 1L, s"grid row $gy")
  }

  private def docsFrame(n: Int) = df(
    (0L until n.toLong).map(i => Row(i, s"doc $i")),
    "doc_id BIGINT, text STRING")

  test("planted v=5 and v=6 family members are byte-identical payloads") {
    val media = Multimodal.dhashMediaFromDocuments(docsFrame(42))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // Family f=0: doc_ids 15 (v=5) and 18 (v=6) share vp=5.
    assert(media(15L).sameElements(media(18L)))
    assert(!media(12L).sameElements(media(15L))) // v=4 differs
  }

  test("within-family Hamming equals |Δvp|; cross-family pairs are far") {
    val sigs = Multimodal.dhashPngs(
        Multimodal.dhashMediaFromDocuments(docsFrame(42)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Family 0 members: doc_id 3v, vp = min(v, 5).
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    for (v1 <- 0 to 6; v2 <- 0 to 6) {
      val expected = math.abs(math.min(v1, 5) - math.min(v2, 5))
      assert(ham(3L * v1, 3L * v2) === expected, s"v=$v1 vs v=$v2")
    }
    // Cross-family (f=0 vs f=1, same variant): the 56 mixed body bits
    // dominate — far beyond any near-dup threshold.
    assert(ham(0L, 21L) > 10)
  }

  test("banded pair join equals the brute-force Hamming predicate") {
    val sigs = Multimodal.dhashPngs(
      Multimodal.dhashMediaFromDocuments(docsFrame(180))).cache()
    val banded = Dedup.hammingPairs(sigs, "media_id", "dhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- all; (idb, sb) <- all if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ida, idb, h)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty)
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 > 0))
    sigs.unpersist()
  }

  test("hammingPairsAgainst equals the brute-force cross predicate") {
    val media = Multimodal.dhashMediaFromDocuments(docsFrame(126)).cache()
    val histSigs = Multimodal.dhashPngs(
      media.filter("(media_id % 21) div 3 < 3")).localCheckpoint(true)
    val shardSigs = Multimodal.dhashPngs(
      media.filter("(media_id % 21) div 3 >= 3")).localCheckpoint(true)
    val banded = Dedup.hammingPairsAgainst(shardSigs, histSigs,
        "media_id", "dhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hist = histSigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = shardSigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (sid, ss) <- sh; (hid, hs) <- hist
      d = java.lang.Long.bitCount(ss ^ hs) if d <= 3
    } yield (sid, hid, d)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty)
    media.unpersist()
  }

  test("pair-graph resolution recovers exactly the planted families") {
    val pairs = Dedup.hammingPairs(
      Multimodal.dhashPngs(Multimodal.dhashMediaFromDocuments(docsFrame(126))),
      "media_id", "dhash", maxHamming = 3)
    val cc = graft.ext.DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // All 42 image docs are in some pair (each family's variant chain
    // is connected through |Δvp| <= 3 steps), and every component's
    // label is its family's smallest member 21f.
    assert(cc.size === 42)
    cc.foreach { case (id, comp) =>
      assert(comp === 21L * (id / 21), s"media $id") }
  }

  test("undecodable payloads drop out of the signature frame") {
    val media = df(Seq(
      Row(1L, Array[Byte](1, 2, 3)),
      Row(2L, null)),
      "media_id BIGINT, payload BINARY")
    assert(Multimodal.dhashPngs(media).count() === 0L)
  }

  test("payload pre-dedup decode equals the plain decode row-for-row") {
    // The planted corpus carries byte-identical v=5/v=6 members, so
    // the distinct-payload arm genuinely collapses families here.
    val media = Multimodal.dhashMediaFromDocuments(
      Tables.documents(spark, sfDir))
    val plain = Multimodal.dhashPngs(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dedup = Multimodal.dhashPngsDistinct(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dedup == plain,
      "dhashPngsDistinct must inherit exactly the plain decode's hashes")
    // And the collapse is real: strictly fewer distinct payloads than
    // members (the Hamming-0 plant).
    val nDistinct = media.select(org.apache.spark.sql.functions
      .md5(org.apache.spark.sql.functions.col("payload"))).distinct().count()
    assert(nDistinct < plain.size,
      s"fixture must contain byte-identical payloads ($nDistinct vs ${plain.size})")
  }
}
