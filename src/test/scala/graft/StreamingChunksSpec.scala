package graft

import org.apache.spark.sql.Row

import graft.ext.Multimodal
import graft.stream.StreamingChunks

/** s24 — streaming segment-containment audio drop: batch replay vs
  * brute force, live foreachBatch parity, and the no-evidence
  * (zero-segment) survivor contract. */
class StreamingChunksSpec extends SparkSpec {

  private lazy val media = Multimodal.ahashChunkMediaFromDocuments(
    Tables.documents(spark, sfDir)).localCheckpoint(true)

  private lazy val hist = StreamingChunks.chunkSegments(
    media.filter("(media_id % 6) div 3 = 0 AND (media_id div 6) % 2 = 0"),
    512).localCheckpoint(true)

  private lazy val arrivals = media.filter("(media_id % 6) div 3 = 1")

  test("the batch containment drop equals brute force, and both " +
       "outcomes are exercised (even families drop on the exact 3/6 " +
       "boundary, odd families survive)") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    val histSet = hist.collect().map(_.getLong(3)).toSet
    val segs = Multimodal.ahashChunks(arrivals, 512).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val allIds = arrivals.collect().map(_.getLong(0)).toSet
    val bruteSurvivors = allIds.filter { id =>
      val ss = segs.getOrElse(id, Seq.empty)
      ss.isEmpty ||
        ss.count(histSet.contains) * 1000000L < 500000L * ss.size
    }
    val got = StreamingChunks.chunkDropBatch(arrivals, hist, 512, 500000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === bruteSurvivors)
    assert(got.nonEmpty && got.size < allIds.size,
      "both outcomes must be exercised")
    // Survivors are exactly the odd-family member-1 clips, with their
    // full segment count reported.
    got.foreach { case (id, n) =>
      assert((id / 6) % 2 == 1, s"even-family clip $id must drop")
      assert(n == 6L, s"clip $id reported $n segments")
    }
  }

  test("live two-batch MemoryStream through foreachBatch equals the " +
       "batch replay (per-clip evidence is self-contained in one row, " +
       "so batch boundaries cannot split a verdict)") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = StreamingChunks.chunkDropBatch(arrivals, hist, 512, 500000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val rows = arrivals.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val out = scala.collection.mutable.Buffer[(Long, Long)]()
    val query = input.toDF().toDF("media_id", "payload")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = StreamingChunks.chunkDropBatch(b, hist, 512, 500000L)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        out.synchronized { out ++= s; () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s24-ckpt").toString)
      .start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    assert(out.toSet === batch, "stream and batch survivor sets diverged")
  }

  test("clips with zero fingerprintable segments always survive with " +
       "n_segments 0 (the no-evidence rule)") {
    assume(Multimodal.wavSupported, "JVM ships no WAV codec")
    // An undecodable payload and an all-flat (hash-0 everywhere) clip.
    val n = 1024
    val flat = new Array[Byte](n * 2) // silence: every segment hash 0
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(flat), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val junk = df(Seq(
      Row(900L, Array[Byte](1, 2, 3)),
      Row(901L, bos.toByteArray)),
      "media_id BIGINT, payload BINARY")
    val got = StreamingChunks.chunkDropBatch(junk, hist, 512, 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((900L, 0L), (901L, 0L)), got.toString)
  }
}
