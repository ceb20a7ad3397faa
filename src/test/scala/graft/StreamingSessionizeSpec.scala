package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Sessionize
import graft.stream.StreamingSessionize

/** Streaming sessionization: the flatMapGroupsWithState fold must agree
  * with the batch window formulation on complete data, and the live
  * stream must emit sessions append-mode — inline on a gap-crossing
  * event, via watermark timeout on quiet. */
class StreamingSessionizeSpec extends SparkSpec {

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("batch replay equals the window-formulation Sessionize.summary") {
    val e = Tables.events(spark, sfDir)
    val a = Sessionize.summary(e, gapSeconds = 43200L).collect()
    val b = StreamingSessionize.sessionSummaries(e, gapSeconds = 43200L)
      .collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "custom-state fold diverged from the window formulation")
  }

  test("batch replay is partitioning-invariant") {
    val e = Tables.events(spark, sfDir)
    val a = StreamingSessionize.sessionSummaries(e, 43200L).collect()
    val b = StreamingSessionize.sessionSummaries(e.repartition(13), 43200L)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("live stream: gap close emits inline, quiet close emits on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val stream = input.toDF().toDF("event_id", "ts", "user_id", "value")

    val out = mutable.Buffer[Row]()
    val query = StreamingSessionize
      .sessionStream(stream, gapSeconds = 60L, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect(); () }
      }
      .option("checkpointLocation", Files.tmp("graft-sess-ckpt"))
      .start()
    try {
      // Session 1 of user 7: two events 10 s apart.
      input.addData((1L, sec(100), 7L, 1.5), (2L, sec(110), 7L, 2.5))
      query.processAllAvailable()
      assert(out.isEmpty, "open session must not emit early")
      // An event 300 s later (> gap) closes session 1 INLINE.
      input.addData((3L, sec(410), 7L, 4.0))
      query.processAllAvailable()
      val s1 = out.synchronized(out.toList)
      assert(s1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
        List((7L, 1L, 2L)))
      assert(s1.head.getAs[Double]("total_value") == 4.0)
      assert(s1.head.getAs[Long]("duration_s") == 10L)
      // A far-future event from ANOTHER user pushes the watermark past
      // session 2's quiet horizon -> timeout close, index continuity.
      input.addData((4L, sec(5000), 8L, 0.5))
      query.processAllAvailable()
      input.addData((5L, sec(5001), 8L, 0.5)) // advance watermark again
      query.processAllAvailable()
      val s2 = out.synchronized(out.toList).map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(s2.contains((7L, 2L, 1L)),
        s"expected the quiet session of user 7 to close via timeout: $s2")
      // A returning event for user 7 resumes numbering at 3.
      input.addData((6L, sec(5002), 7L, 9.0), (7L, sec(5200), 7L, 1.0))
      query.processAllAvailable()
      input.addData((8L, sec(9999), 8L, 0.5))
      query.processAllAvailable()
      val s3 = out.synchronized(out.toList).map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(s3.contains((7L, 3L, 1L)),
        s"expected session numbering to resume after a timeout emit: $s3")
    } finally query.stop()
  }

  test("sub-second boundary event stays in-session (timeout horizon regression)") {
    // ADVICE r9: the timeout horizon is (floorSec(last) + gap + 1) s —
    // the gap rule compares FLOOR-SECOND deltas, so an event anywhere
    // in second floorSec(last)+gap is still in-session and the open
    // session may only time out once the watermark clears the END of
    // that second. The pre-fix horizon (last_ms + gap_ms) fires up to
    // a second early: with last = 100.0 s and gap = 60, a watermark at
    // 160.5 s would close the session before the 160.9 s event arrives
    // and split it. This pins the fixed behavior against the batch
    // fold (floor(160.9) - floor(100.0) = 60 <= 60 -> same session).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = (m: Long) => new Timestamp(m)
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val stream = input.toDF().toDF("event_id", "ts", "user_id", "value")
    val out = mutable.Buffer[Row]()
    val query = StreamingSessionize
      .sessionStream(stream, gapSeconds = 60L, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect(); () }
      }
      .option("checkpointLocation", Files.tmp("graft-sess-ckpt-subsec"))
      .start()
    try {
      input.addData((1L, ms(100000L), 7L, 1.0)) // last = 100.0 s
      query.processAllAvailable()
      // Watermark to 160.5 s — INSIDE the boundary second. The session
      // must NOT time out (horizon is 161.0 s).
      input.addData((2L, ms(160500L), 8L, 0.5))
      query.processAllAvailable()
      assert(out.synchronized(out.toList).forall(_.getLong(0) != 7L),
        "session of user 7 timed out inside the boundary second")
      // The boundary event: floor(160.9) - floor(100.0) = 60 <= gap.
      input.addData((3L, ms(160900L), 7L, 2.0))
      query.processAllAvailable()
      // Close everything via far-future watermark pushes.
      input.addData((4L, ms(999000000L), 8L, 0.5))
      query.processAllAvailable()
      input.addData((5L, ms(999001000L), 8L, 0.5))
      query.processAllAvailable()
      val u7 = out.synchronized(out.toList).filter(_.getLong(0) == 7L)
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(u7 == List((1L, 2L)),
        s"expected ONE 2-event session for user 7, got $u7")
      // And the batch fold agrees on the same data.
      val batch = StreamingSessionize.sessionSummaries(
        Seq((1L, ms(100000L), 7L, 1.0), (3L, ms(160900L), 7L, 2.0))
          .toDF("event_id", "ts", "user_id", "value"), 60L)
        .filter(col("user_id") === 7L)
        .select("session_idx", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      assert(batch == List((1L, 2L)))
    } finally query.stop()
  }
}
