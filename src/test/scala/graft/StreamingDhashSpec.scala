package graft

import org.apache.spark.sql.Row

import graft.ext.Multimodal
import graft.stream.StreamingDhash

/** s19 — streaming image near-dup drop vs a saved dHash index: live
  * MemoryStream ≡ batch replay, cross-batch independence (stream-static
  * joins carry no state), and the null-signature survival contract. */
class StreamingDhashSpec extends SparkSpec {

  /** A small planted corpus through the REAL codec: doc_ids 0..125
    * (image lane = 42 PNGs, 6 families × 7 variants). */
  private def docs(n: Int) = df(
    (0L until n.toLong).map(i => Row(i, s"d$i")),
    "doc_id BIGINT, text STRING")

  private lazy val media =
    Multimodal.dhashMediaFromDocuments(docs(126)).cache()
  private lazy val history =
    media.filter("(media_id % 21) div 3 < 3")
  private lazy val shard =
    media.filter("(media_id % 21) div 3 >= 3")
  private lazy val histSigs = Multimodal.dhashPngs(history)
    .localCheckpoint(true)

  test("batch replay: vp=3/4 drop against history, vp=5/6 survive at " +
       "maxHamming=2") {
    val out = StreamingDhash.dhashDropStreamAgainst(shard, histSigs,
        maxHamming = 2)
      .collect().map(_.getLong(0)).toSet
    // Per family f: shard members are 21f+9..18 (v=3..6, capped vp
    // 3,4,5,5); history holds vp 0-2, so distance-1/2 members (v=3,4)
    // drop and distance-3 members (v=5,6) survive.
    val expected = (0 until 6).flatMap(f => Seq(21L * f + 15, 21L * f + 18)).toSet
    assert(out === expected)
  }

  test("live two-batch MemoryStream equals the batch replay; splitting " +
       "the shard across micro-batches changes nothing (stateless)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = shard.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val out = scala.collection.mutable.Buffer[Long]()
    val query = StreamingDhash.dhashDropStreamAgainst(
        input.toDF().toDF("media_id", "payload"), histSigs, maxHamming = 2)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)); () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s19-ckpt").toString)
      .start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    val batch = StreamingDhash.dhashDropStreamAgainst(shard, histSigs,
      maxHamming = 2).collect().map(_.getLong(0))
    assert(out.sorted.toSeq === batch.sorted.toSeq,
      "stream and batch drop sets diverged")
  }

  test("undecodable payloads survive with a null signature — a dedup " +
       "stage never eats corrupt media") {
    val junk = df(Seq(
      Row(900L, Array[Byte](9, 9, 9)),
      Row(901L, null)),
      "media_id BIGINT, payload BINARY")
    val out = StreamingDhash.dhashDropStreamAgainst(junk, histSigs,
        maxHamming = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(900L, 901L))
    assert(out.forall(_.isNullAt(1)), "junk must carry a null dhash")
  }

  test("s21 pHash lane: live two-batch MemoryStream equals the batch " +
       "replay, and both equal brute force (the generalized drop core)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The pHash corpus: families of 8 variants on image-lane doc_ids.
    // 21 families — wide enough to plant BOTH outcomes (whether a
    // family's far variants sit at distance 2 or 4 from its history
    // variants is a per-family property of the luma mix; the 7-family
    // slice happens to hold only droppers).
    val pmedia = Multimodal.phashMediaFromDocuments(docs(504))
      .localCheckpoint(true)
    val phist = Multimodal.phashImages(
      pmedia.filter("(media_id % 24) div 3 < 3")).localCheckpoint(true)
    val pshard = pmedia.filter("(media_id % 24) div 3 >= 3")
    val batch = StreamingDhash.phashDropStreamAgainst(pshard, phist,
      maxHamming = 2).collect().map(_.getLong(0)).toSet
    // Brute force over the shared decode body.
    val hist = phist.collect().map(r => r.getLong(1))
    val sh = Multimodal.phashImages(pshard).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = sh.collect {
      case (id, h) if !hist.exists(x =>
        java.lang.Long.bitCount(x ^ h) <= 2) => id
    }.toSet
    assert(batch === brute)
    assert(brute.nonEmpty && brute.size < sh.length,
      "both outcomes must be exercised")
    // Live parity across two micro-batches (stateless fold).
    val rows = pshard.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val out = scala.collection.mutable.Buffer[Long]()
    val query = StreamingDhash.phashDropStreamAgainst(
        input.toDF().toDF("media_id", "payload"), phist, maxHamming = 2)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)); () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s21-ckpt").toString)
      .start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    assert(out.toSet === batch, "stream and batch drop sets diverged")
  }

  test("s23 aHash lane: live two-batch MemoryStream equals the batch " +
       "replay, and both equal brute force (third drop-core consumer)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val amedia = Multimodal.ahashMediaFromDocuments(docs(504))
      .localCheckpoint(true)
    val ahist = Multimodal.ahashWavs(
      amedia.filter("(media_id % 21) div 3 < 3")).localCheckpoint(true)
    val ashard = amedia.filter("(media_id % 21) div 3 >= 3")
    val batch = StreamingDhash.ahashDropStreamAgainst(ashard, ahist,
      maxHamming = 3).collect().map(_.getLong(0)).toSet
    val hist = ahist.collect().map(r => r.getLong(1))
    val sh = Multimodal.ahashWavs(ashard).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = sh.collect {
      case (id, h) if !hist.exists(x =>
        java.lang.Long.bitCount(x ^ h) <= 3) => id
    }.toSet
    assert(batch === brute)
    assert(brute.nonEmpty && brute.size < sh.length,
      "both outcomes must be exercised")
    val rows = ashard.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val out = scala.collection.mutable.Buffer[Long]()
    val query = StreamingDhash.ahashDropStreamAgainst(
        input.toDF().toDF("media_id", "payload"), ahist, maxHamming = 3)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)); () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s23-ckpt").toString)
      .start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    assert(out.toSet === batch, "stream and batch drop sets diverged")
  }

  test("the banded drop set equals the brute-force Hamming predicate") {
    val hist = histSigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = Multimodal.dhashPngs(shard).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bruteSurvivors = sh.collect {
      case (id, h) if !hist.exists(x =>
        java.lang.Long.bitCount(x._2 ^ h) <= 2) => id
    }.toSet
    val banded = StreamingDhash.dhashDropStreamAgainst(shard, histSigs,
        maxHamming = 2)
      .collect().map(_.getLong(0)).toSet
    assert(banded === bruteSurvivors)
    assert(bruteSurvivors.nonEmpty && bruteSurvivors.size < sh.length,
      "both outcomes must be exercised")
  }
}
