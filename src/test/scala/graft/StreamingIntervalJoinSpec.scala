package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.stream.StreamingIntervalJoin

class StreamingIntervalJoinSpec extends SparkSpec {

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  private val lddl = "imp_id BIGINT, user_id BIGINT, ts TIMESTAMP"
  private val rddl = "conv_id BIGINT, user_id BIGINT, ts TIMESTAMP"

  private val imps = Seq(
    Row(1L, 1L, sec(100)), Row(2L, 1L, sec(200)),
    Row(3L, 2L, sec(100)), Row(4L, 3L, sec(100)))
  private val convs = Seq(
    Row(10L, 1L, sec(150)),  // joins imp 1 (lag 50)
    Row(11L, 1L, sec(260)),  // joins imp 2 (lag 60) — NOT imp 1 (160 > 100)
    Row(12L, 2L, sec(100)),  // joins imp 3 (lag 0 — closed lower bound)
    Row(13L, 2L, sec(201)),  // no join (101 > the 100-second bound)
    Row(14L, 9L, sec(100)))  // no join (unknown key)

  test("batch replay: closed [ts, ts+within] bounds, key equality, " +
       "right columns prefixed") {
    val out = StreamingIntervalJoin.joinWithin(
        df(imps, lddl), df(convs, rddl), keyCol = "user_id",
        leftTime = "ts", rightTime = "ts", withinSeconds = 100L)
      .select(col("imp_id"), col("r_conv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 11L), (3L, 12L)))
    // conv at exactly ts+within joins (closed upper bound).
    val edge = StreamingIntervalJoin.joinWithin(
        df(Seq(Row(1L, 1L, sec(100))), lddl),
        df(Seq(Row(10L, 1L, sec(200))), rddl),
        "user_id", "ts", "ts", withinSeconds = 100L)
      .count()
    assert(edge == 1L, "the upper bound must be closed, like BETWEEN")
  }

  test("live two-stream join equals batch on in-order data; a row " +
       "behind both watermarks is dropped, not joined") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val rIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val out = scala.collection.mutable.Buffer[(Long, Long)]()
    val query = StreamingIntervalJoin.joinWithin(
        lIn.toDF().toDF("imp_id", "user_id", "ts"),
        rIn.toDF().toDF("conv_id", "user_id", "ts"),
        "user_id", "ts", "ts", withinSeconds = 100L, delaySeconds = 10L)
      .select(col("imp_id"), col("r_conv_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r => (r.getLong(0), r.getLong(1)))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s18-ckpt").toString)
      .start()
    try {
      // In-order feed: everything the batch join produces must emit.
      lIn.addData(imps.map(r =>
        (r.getLong(0), r.getLong(1), r.getAs[Timestamp](2))))
      rIn.addData(convs.map(r =>
        (r.getLong(0), r.getLong(1), r.getAs[Timestamp](2))))
      query.processAllAvailable()
      assert(out.toSet == Set((1L, 10L), (2L, 11L), (3L, 12L)),
        s"stream joined ${out.toSet}, batch joins 3 pairs")
      // Advance BOTH watermarks far past the old rows (watermark =
      // max event time − 10 s), then feed a matching pair entirely in
      // the past: both rows are late → dropped, no output.
      lIn.addData(Seq((90L, 7L, sec(100000))))
      rIn.addData(Seq((91L, 8L, sec(100000))))
      query.processAllAvailable()
      val before = out.size
      lIn.addData(Seq((5L, 3L, sec(110))))  // would join conv 15 in batch
      rIn.addData(Seq((15L, 3L, sec(120))))
      query.processAllAvailable()
      assert(out.size == before,
        s"late rows behind the watermark must be dropped: ${out.toSeq}")
    } finally query.stop()
  }

  test("left_outer live: an unmatched impression emits null-extended " +
       "exactly once, only after watermark passage; a late conversion " +
       "does not resurrect it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val rIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val out = scala.collection.mutable.Buffer[(Long, Option[Long])]()
    val query = StreamingIntervalJoin.joinWithin(
        lIn.toDF().toDF("imp_id", "user_id", "ts"),
        rIn.toDF().toDF("conv_id", "user_id", "ts"),
        "user_id", "ts", "ts", withinSeconds = 100L, delaySeconds = 10L,
        joinType = "left_outer")
      .select(col("imp_id"), col("r_conv_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r =>
            (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s20-ckpt").toString)
      .start()
    try {
      // One matched impression (user 1) and one that never converts
      // (user 2). The match emits inner-style immediately; the
      // unmatched row must NOT emit yet — no watermark has passed
      // ts + within + delay = 210.
      lIn.addData(Seq((1L, 1L, sec(100)), (2L, 2L, sec(100))))
      rIn.addData(Seq((10L, 1L, sec(150))))
      query.processAllAvailable()
      assert(out.toSet == Set((1L, Some(10L))),
        s"before watermark passage only the matched pair may emit: $out")
      // Advance BOTH watermarks past 210 (watermark = max event time −
      // 10 s). The evicted impression 2 must now emit null-extended,
      // exactly once (outer emission can trail by one micro-batch —
      // feed a second advancing batch before asserting).
      lIn.addData(Seq((90L, 7L, sec(1000))))
      rIn.addData(Seq((91L, 8L, sec(1000))))
      query.processAllAvailable()
      lIn.addData(Seq((92L, 7L, sec(1100))))
      rIn.addData(Seq((93L, 8L, sec(1100))))
      query.processAllAvailable()
      assert(out.count(_ == (2L -> None)) == 1,
        s"unmatched impression must emit null-extended exactly once: $out")
      // A late conversion for user 2 (behind the watermark) is dropped
      // at ingest and must not produce a pair or a duplicate.
      val before = out.size
      rIn.addData(Seq((20L, 2L, sec(150))))
      query.processAllAvailable()
      assert(out.size == before,
        s"a late conversion must not resurrect the evicted row: $out")
    } finally query.stop()
  }

  test("left_outer batch replay equals the plain LEFT JOIN BETWEEN") {
    val got = StreamingIntervalJoin.joinWithin(
        df(imps, lddl), df(convs, rddl), keyCol = "user_id",
        leftTime = "ts", rightTime = "ts", withinSeconds = 100L,
        joinType = "left_outer")
      .select(col("imp_id"), col("r_conv_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // imp 4 (user 3) has no conversion → null-extended.
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 12L), (4L, -1L)))
  }

  test("full_outer batch replay equals the plain FULL JOIN BETWEEN, " +
       "key coalesced across sides") {
    val got = StreamingIntervalJoin.joinWithin(
        df(imps, lddl), df(convs, rddl), keyCol = "user_id",
        leftTime = "ts", rightTime = "ts", withinSeconds = 100L,
        joinType = "full_outer")
      .select(col("imp_id"), col("r_conv_id"), col("user_id"))
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2)))
      .toSet
    // imp 4 (user 3) has no conversion; convs 13 (user 2, out of
    // window) and 14 (user 9, unknown key) have no impression — the
    // coalesced key must survive on the right-only rows.
    assert(got == Set((1L, 10L, 1L), (2L, 11L, 1L), (3L, 12L, 2L),
      (4L, -1L, 3L), (-1L, 13L, 2L), (-1L, 14L, 9L)))
  }

  test("full_outer live: null-extension on BOTH sides after the " +
       "respective watermark passages, exactly once, no resurrection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val rIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val out = scala.collection.mutable.Buffer[(Option[Long], Option[Long])]()
    val query = StreamingIntervalJoin.joinWithin(
        lIn.toDF().toDF("imp_id", "user_id", "ts"),
        rIn.toDF().toDF("conv_id", "user_id", "ts"),
        "user_id", "ts", "ts", withinSeconds = 100L, delaySeconds = 10L,
        joinType = "full_outer")
      .select(col("imp_id"), col("r_conv_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r =>
            (if (r.isNullAt(0)) None else Some(r.getLong(0)),
              if (r.isNullAt(1)) None else Some(r.getLong(1))))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s22-ckpt").toString)
      .start()
    try {
      // A matched pair (user 1), an impression that never converts
      // (user 2), and a conversion that never had an impression
      // (user 9). Neither unmatched row may emit before its
      // eviction-bound watermark passage.
      lIn.addData(Seq((1L, 1L, sec(100)), (2L, 2L, sec(100))))
      rIn.addData(Seq((10L, 1L, sec(150)), (14L, 9L, sec(100))))
      query.processAllAvailable()
      assert(out.toSet == Set((Some(1L), Some(10L))),
        s"before watermark passage only the matched pair may emit: $out")
      // Advance both watermarks far past every eviction bound; outer
      // emission can trail by one micro-batch, so feed two advancing
      // batches. BOTH unmatched rows must now emit null-extended,
      // exactly once each.
      lIn.addData(Seq((90L, 7L, sec(1000))))
      rIn.addData(Seq((91L, 8L, sec(1000))))
      query.processAllAvailable()
      lIn.addData(Seq((92L, 7L, sec(1100))))
      rIn.addData(Seq((93L, 8L, sec(1100))))
      query.processAllAvailable()
      assert(out.count(_ == (Some(2L) -> None)) == 1,
        s"unmatched impression must emit null-extended exactly once: $out")
      assert(out.count(_ == (None -> Some(14L))) == 1,
        s"unmatched conversion must emit null-extended exactly once: $out")
      // Late rows on either side are dropped at ingest — no pair, no
      // duplicate, no resurrection.
      val before = out.size
      rIn.addData(Seq((20L, 2L, sec(150))))
      lIn.addData(Seq((6L, 9L, sec(90))))
      query.processAllAvailable()
      assert(out.size == before,
        s"late rows must not resurrect evicted partners: $out")
    } finally query.stop()
  }

  test("the registered lane's shape: stream output equals the plain " +
       "BETWEEN join on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val imps = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id"), col("ts"))
    val convs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"), col("ts"))
    val got = StreamingIntervalJoin.joinWithin(imps, convs,
        "user_id", "ts", "ts", withinSeconds = 43200L)
      .select("imp_id", "r_conv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = imps.as("i").join(convs.as("c"),
        col("i.user_id") === col("c.user_id") &&
          col("c.ts") >= col("i.ts") &&
          col("c.ts") <= col("i.ts") + expr("INTERVAL 43200 SECONDS"))
      .select(col("imp_id"), col("conv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty, "the fixture must produce attribution pairs")
  }
}
