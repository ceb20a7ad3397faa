package graft

import org.apache.spark.sql.Row

import graft.ext.Multimodal

/** X5k — video frame-majority near-dup: planted re-cut structure,
  * banded-vs-brute parity at the clip level, the exact ppm boundary,
  * and the codec-edge contracts. */
class VideoNeardupSpec extends SparkSpec {

  private lazy val media = Multimodal.videoMediaFromDocuments(
    Tables.documents(spark, sfDir)).localCheckpoint(true)

  private lazy val frames = Multimodal.videoFramePhashes(media)
    .localCheckpoint(true)

  test("family pairs share EXACTLY their 4 planted frame contents " +
       "(the two-frame re-cut), cross-family pairs share nothing, and " +
       "the 600000-ppm gate admits exactly the family pairs") {
    assume(Multimodal.gifSupported, "JVM ships no GIF codec")
    val sigs = frames.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(sigs.nonEmpty)
    sigs.groupBy(_._1).foreach { case (id, ss) =>
      assert(ss.length == 6, s"clip $id decoded ${ss.length} frames")
    }
    // Brute-force frame-majority over collected signatures must equal
    // the engine's banded pair frame exactly.
    val byClip = sigs.groupBy(_._1).view
      .mapValues(_.map(s => (s._2, s._3))).toMap
    val ids = byClip.keys.toSeq.sorted
    def matchedFrames(as: Seq[(Int, Long)], bs: Seq[(Int, Long)]): Long =
      as.filter { case (_, ha) =>
        bs.exists { case (_, hb) =>
          java.lang.Long.bitCount(ha ^ hb) <= 4 } }
        .map(_._1).distinct.size.toLong
    val brute = (for {
      a <- ids; b <- ids if a < b
      ma = matchedFrames(byClip(a), byClip(b))
      mb = matchedFrames(byClip(b), byClip(a))
      if math.min(ma, mb) * 1000000L >= 600000L * 6L
    } yield (a, b, ma, mb)).toSet
    val engine = Multimodal.frameMajorityPairs(frames, 4, 600000L)
      .collect()
      .map(r => (r.getAs[Long]("media_id_a"), r.getAs[Long]("media_id_b"),
        r.getAs[Long]("matched_a"), r.getAs[Long]("matched_b"))).toSet
    assert(engine == brute,
      s"engine ${engine.size} pairs vs brute ${brute.size}")
    assert(engine.nonEmpty, "fixture must contain family pairs")
    engine.foreach { case (a, b, ma, mb) =>
      assert(b == a + 3 && a % 6 == 0, s"unexpected pair ($a,$b)")
      assert(ma == 4L && mb == 4L, s"pair ($a,$b) matched $ma/$mb, want 4")
    }
    // A stricter 5/6 gate admits none: the boundary is live.
    assert(Multimodal.frameMajorityPairs(frames, 4, 833334L).count() == 0L)
  }

  test("shared frame contents hash bit-for-bit across the re-cut " +
       "(lossless indexed color through the real codec round trip)") {
    assume(Multimodal.gifSupported, "JVM ships no GIF codec")
    val sigs = frames.collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val pairs = sigs.keys.map(_._1).filter(_ % 6 == 0)
      .filter(id => sigs.contains((id + 3, 0))).toSeq.sorted
    assert(pairs.nonEmpty)
    pairs.foreach { a =>
      (0 until 4).foreach { k => // member0 frame k+2 == member1 frame k
        assert(sigs((a, k + 2)) == sigs((a + 3, k)),
          s"clip $a frame ${k + 2} != clip ${a + 3} frame $k")
      }
    }
  }

  test("alignment admits the ordered re-cut but REJECTS a " +
       "frame-permuted copy that majority admits — the temporal-order " +
       "discrimination (X5k-align)") {
    assume(Multimodal.gifSupported, "JVM ships no GIF codec")
    // The registered alignment lane admits exactly the planted re-cut
    // pairs, each aligned 4/6 at one offset.
    val aligned = Multimodal.frameAlignmentPairs(frames, 4, 600000L)
      .collect()
      .map(r => (r.getAs[Long]("media_id_a"), r.getAs[Long]("media_id_b"),
        r.getAs[Long]("aligned")))
    assert(aligned.nonEmpty)
    aligned.foreach { case (a, b, n) =>
      assert(b == a + 3 && a % 6 == 0 && n == 4L, s"($a,$b,$n)")
    }
    // Construct a SHUFFLED copy of one clip: same frame multiset with
    // adjacent pairs swapped ([1,0,3,2,5,4] — NOT a rotation, which
    // would itself be an ordered shift). Majority (set semantics)
    // pairs them 6/6; alignment's best offset carries only 3 frames
    // (offsets alternate +1/−1) — fails the 600,000-ppm gate.
    val base = frames.filter("media_id = 0").collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assume(base.length == 6, "fixture clip 0 must exist")
    val perm = Array(1, 0, 3, 2, 5, 4)
    val shuffled = base.map { case (k, h) => (perm(k), h) }
    val two = df(
      base.map { case (k, h) => Row(9000001L, k, h) }.toSeq ++
        shuffled.map { case (k, h) => Row(9000002L, k, h) },
      "media_id BIGINT, frame_idx INT, phash BIGINT")
    val maj = Multimodal.frameMajorityPairs(two, 4, 600000L).collect()
    assert(maj.length == 1 && maj.head.getAs[Long]("matched_a") == 6L,
      s"majority must admit the shuffled copy: ${maj.toSeq}")
    val ali = Multimodal.frameAlignmentPairs(two, 4, 600000L).collect()
    assert(ali.isEmpty,
      s"alignment must reject the shuffled copy: ${ali.toSeq}")
  }

  test("undecodable payloads decode to zero frames and vanish from " +
       "the signature frame") {
    assume(Multimodal.gifSupported, "JVM ships no GIF codec")
    val junk = df(Seq(
      Row(900L, Array[Byte](1, 2, 3)),
      Row(901L, null)),
      "media_id BIGINT, payload BINARY")
    assert(Multimodal.videoFramePhashes(junk).count() === 0L)
  }

  test("the incremental probe vs the persisted frame index equals the " +
       "brute-force cross predicate (X1h posture on video)") {
    assume(Multimodal.gifSupported, "JVM ships no GIF codec")
    val hist = frames.filter("(media_id % 6) div 3 = 0")
      .localCheckpoint(true)
    val probes = frames.filter("(media_id % 6) div 3 = 1")
    def byClip(f: org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    val hc = byClip(hist); val pc = byClip(probes)
    def matched(as: Seq[(Int, Long)], bs: Seq[(Int, Long)]): Long =
      as.filter { case (_, ha) => bs.exists { case (_, hb) =>
        java.lang.Long.bitCount(ha ^ hb) <= 4 } }
        .map(_._1).distinct.size.toLong
    val brute = (for {
      n <- pc.keys.toSeq; h <- hc.keys.toSeq
      mn = matched(pc(n), hc(h)); mh = matched(hc(h), pc(n))
      if math.min(mn, mh) * 1000000L >= 600000L * 6L
    } yield (n, h, mn, mh)).toSet
    val engine = Multimodal.frameMajorityAgainst(probes, hist, 4, 600000L)
      .collect().map(r => (r.getAs[Long]("media_id_new"),
        r.getAs[Long]("media_id_hist"), r.getAs[Long]("matched_new"),
        r.getAs[Long]("matched_hist"))).toSet
    assert(engine == brute,
      s"engine ${engine.size} vs brute ${brute.size}")
    assert(engine.nonEmpty)
    engine.foreach { case (n, h, mn, mh) =>
      assert(n == h + 3 && mn == 4L && mh == 4L, s"($n,$h,$mn,$mh)")
    }
  }
}
