package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** X5h — cross-codec image near-dup dedup: the certainty bands the
  * registered lane's closed-form oracle rests on, measured on the REAL
  * union corpus (planted pHash PNGs + their JDK JPEG q0.95 re-encodes),
  * plus end-to-end drop-set parity against brute force. */
class XcodecDedupSpec extends SparkSpec {

  private lazy val pngs = Multimodal.phashMediaFromDocuments(
    Tables.documents(spark, sfDir))

  private val Offset = 1000000000L

  private lazy val sigs: Array[(Long, Long)] = Multimodal.phashImages(
      pngs.unionByName(Multimodal.reencodeJpegs(pngs, Offset)))
    .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("certainty bands: re-encode drift <= 6, within-family <= 6, " +
       "cross-family > 6 (both codecs)") {
    assume(Multimodal.jpegSupported && Multimodal.pngSupported,
      "JVM ships no JPEG/PNG codec")
    val byId = sigs.toMap
    val pngIds = sigs.map(_._1).filter(_ < Offset)
    assert(pngIds.nonEmpty && sigs.length == 2 * pngIds.length,
      "every PNG must have exactly one re-encode")
    // Band 1: every re-encode within the registered threshold of its
    // OWN original — what guarantees each drops against it.
    pngIds.foreach { id =>
      val d = java.lang.Long.bitCount(byId(id) ^ byId(id + Offset))
      assert(d <= 6, s"re-encode of $id drifted $d bits")
    }
    // Bands 2/3: within-family (any codec pair) stays inside the
    // threshold; cross-family stays strictly outside it — the
    // separation that makes the closed-form drop set exact.
    def fam(id: Long) = (id % Offset) / 24
    var withinMax = 0
    var crossMin = 64
    for (((a, ha), i) <- sigs.zipWithIndex; (b, hb) <- sigs.drop(i + 1)) {
      val d = java.lang.Long.bitCount(ha ^ hb)
      if (fam(a) == fam(b)) withinMax = math.max(withinMax, d)
      else crossMin = math.min(crossMin, d)
    }
    assert(withinMax <= 6, s"within-family distance $withinMax escapes " +
      "the certainty band")
    assert(crossMin > 6, s"cross-family distance $crossMin enters the " +
      "certainty band")
  }

  test("engine drop set equals the brute-force keep-first drop set " +
       "over the union corpus") {
    assume(Multimodal.jpegSupported && Multimodal.pngSupported,
      "JVM ships no JPEG/PNG codec")
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield b).toSet
    val engine = Queries.x5XcodecDedup(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(engine == brute,
      s"engine ${engine.size} dropped vs brute ${brute.size}")
    // Both outcomes live: every re-encode drops, and at least one
    // original survives (each family's min member).
    assert(sigs.map(_._1).filter(_ >= Offset).forall(engine.contains))
    assert(sigs.map(_._1).exists(id => id < Offset && !engine.contains(id)))
  }

  test("cross-codec resolution equals brute-force connected components " +
       "— one cluster per family, both codecs, PNG representative") {
    assume(Multimodal.jpegSupported && Multimodal.pngSupported,
      "JVM ships no JPEG/PNG codec")
    // Brute-force union-find over the full Hamming-<=6 pair relation.
    val parent = scala.collection.mutable.Map(
      sigs.map(t => t._1 -> t._1).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, ha) <- sigs; (b, hb) <- sigs
         if a < b && java.lang.Long.bitCount(ha ^ hb) <= 6) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val brute = sigs.map(t => t._1 -> find(t._1)).toMap
    val engine = Queries.x5XcodecGroups(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(engine.keySet == brute.keySet)
    engine.foreach { case (id, (cluster, keep)) =>
      assert(cluster == brute(id), s"$id clustered $cluster vs brute")
      assert(keep == (cluster == id))
    }
    // The production claim: every cluster representative is an
    // ORIGINAL, and every re-encode resolves into its original's
    // cluster.
    assert(engine.values.map(_._1).toSet.forall(_ < Offset))
    sigs.map(_._1).filter(_ >= Offset).foreach { j =>
      assert(engine(j)._1 == engine(j - Offset)._1,
        s"re-encode $j resolved apart from its original")
    }
  }
}
