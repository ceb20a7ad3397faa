package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.checks.{BetweenCheck, NotNullCheck, RowCountCheck}
import graft.model.ValidationResult
import graft.stream.StreamingSuite

/** Streaming validation suite: tumbling windows + watermark over an
  * event-time stream, fused G-checks per window, late-data drop. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  test("windowed suite finalizes windows past the watermark and drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")

    val checks = Seq(RowCountCheck(), NotNullCheck("event_type"),
      BetweenCheck("value", min = Some(0.0)))
    val results = mutable.Map[Timestamp, Seq[ValidationResult]]()

    val dir = Files.tmp("graft-stream-test")
    val query = StreamingSuite.writer(
      stream, "ts", "5 minutes", "5 minutes", checks, "graft-stream-spec") {
      (w, rs) => results.synchronized { results(w) = rs }
    }.option("checkpointLocation", dir).start()

    try {
      // Window 10:00-10:05 — 3 clean events.
      input.addData((ts(0), "click", 1.0), (ts(2), "view", 2.0), (ts(4), "click", 3.0))
      query.processAllAvailable()
      assert(results.isEmpty) // watermark hasn't passed the window end yet

      // Event at 10:11 pushes the watermark to 10:06 → first window emits.
      input.addData((ts(11), "click", -5.0))
      query.processAllAvailable()
      assert(results.keySet == Set(ts(0)))
      val w1 = results(ts(0))
      assert(w1.forall(_.passed))
      assert(w1.head.elementCount == 3L)

      // A late event inside the already-finalized window is DROPPED…
      input.addData((ts(1), "late", 100.0))
      // …and an event at 10:21 closes the 10:10-10:15 window.
      input.addData((ts(21), "view", 7.0))
      query.processAllAvailable()
      assert(results(ts(0)).head.elementCount == 3L) // unchanged: late row dropped
      val w2 = results(ts(10))
      assert(w2.head.elementCount == 1L) // only the 10:11 event
      // The negative value in window 2 fails the between check.
      assert(w2.exists(r => r.validationName.startsWith("between") && !r.passed))
    } finally query.stop()
  }

  test("file-source streaming: the events parquet replayed through readStream") {
    // The realistic entry point at scale — a parquet directory consumed
    // incrementally: first micro-batch is the driver's events file, a
    // second far-future file pushes the watermark so every data window
    // finalizes and emits.
    import java.nio.file.{Files => JF, Paths}
    import org.apache.spark.sql.functions._
    val inDir = Files.tmp("graft-stream-in")
    JF.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$inDir/batch0.parquet"))
    val schema = Tables.load(spark, sfDir, "events").schema
    val tsType = schema("ts").dataType
    // Same schema-adaptive normalization as Tables.events: legacy
    // long-nanos floor-divides to micros; native timestamp encodings
    // (incl. TIMESTAMP_NTZ, which Spark infers for tz-less parquet)
    // cast through to session-TZ TimestampType for the watermark.
    val rawIn = spark.readStream.schema(schema).parquet(inDir)
    val raw =
      if (tsType == org.apache.spark.sql.types.LongType)
        rawIn.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else rawIn.withColumn("ts", col("ts").cast("timestamp"))

    val counts = mutable.Buffer[Long]()
    val ckpt = Files.tmp("graft-stream-file-ckpt")
    val query = StreamingSuite.writer(
      raw, "ts", "1 day", "0 seconds", Seq(RowCountCheck()), "graft-stream-file") {
      (_, rs) => counts.synchronized { counts += rs.head.elementCount }
    }.option("checkpointLocation", ckpt).start()
    try {
      query.processAllAvailable()
      // Closer file: one event far in the future, written in the SAME
      // ts encoding as the driver's file so the readStream schema holds.
      val closerTs =
        if (tsType == org.apache.spark.sql.types.LongType)
          lit(4102444800L * 1000000000L) // 2100-01-01 in nanos
        else to_timestamp(lit("2100-01-01 00:00:00")).cast(tsType)
      val scratch = Files.tmp("graft-closer")
      spark.range(1).select(
        lit(999999L).as("event_id"),
        closerTs.as("ts"),
        lit(0L).as("user_id"), lit("closer").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = JF.list(Paths.get(scratch)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      JF.copy(part, Paths.get(s"$inDir/closer.parquet"))
      query.processAllAvailable()
      assert(counts.sum == Tables.events(spark, sfDir).count(),
        "every pre-closer event must land in exactly one finalized window")
      assert(counts.size >= 2, "expected multiple event-time windows")
    } finally query.stop()
  }

  test("mostly rides the fused window aggregate: within-tolerance windows PASS") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val stream = input.toDF().toDF("ts", "value")

    // 25% violations in window 1 (within mostly=0.7), 50% in window 2
    // (beyond it); the extra non-null counter rides the SAME stateful
    // aggregate — no second scan, one state row per window.
    val checks = Seq(graft.checks.MostlyCheck(
      BetweenCheck("value", min = Some(0.0)), mostly = 0.7))
    val results = mutable.Map[Timestamp, Seq[ValidationResult]]()
    val dir = Files.tmp("graft-stream-mostly")
    val query = StreamingSuite.writer(
      stream, "ts", "5 minutes", "5 minutes", checks, "graft-stream-mostly") {
      (w, rs) => results.synchronized { results(w) = rs }
    }.option("checkpointLocation", dir).start()
    try {
      val w1 = Seq((ts(0), -1.0), (ts(1), 1.0), (ts(2), 2.0), (ts(3), 3.0))
      val w2 = Seq((ts(6), -1.0), (ts(7), -2.0), (ts(8), 3.0), (ts(9), 4.0))
      input.addData(w1: _*)
      input.addData(w2: _*)
      input.addData((ts(21), 0.0)) // closer: watermark past both windows
      query.processAllAvailable()

      val r1 = results(ts(0)).head
      assert(r1.passed && r1.unexpectedCount == 1,
        s"25% violations must pass mostly=0.7: $r1")
      assert(r1.message.contains("mostly=0.7"))
      val r2 = results(ts(5)).head
      assert(!r2.passed && r2.unexpectedCount == 2,
        s"50% violations must fail mostly=0.7: $r2")

      // Batch/streaming parity: the same check over each window's rows,
      // batch-evaluated, yields the identical verdict and counters.
      for ((rows, w) <- Seq((w1, r1), (w2, r2))) {
        val batch = rows.toDF("ts", "value")
        val b = graft.checks.CheckSuite.runBatched(batch, checks).head
        assert(b.status == w.status && b.unexpectedCount == w.unexpectedCount &&
          b.elementCount == w.elementCount)
      }
    } finally query.stop()
  }

  test("row_condition rides the fused window aggregate (batch-replay path)") {
    import graft.checks.{CheckSuite, ConditionedCheck}
    val events = Tables.events(spark, sfDir)
    val check = ConditionedCheck(
      BetweenCheck("value", min = Some(0.0)), "event_type = 'click'")
    val windowed = StreamingSuite.windowedChecks(
      events, "ts", "1 day", "0 seconds", Seq(check))
    val verdicts = windowed.collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start") ->
        StreamingSuite.evaluate(r, Seq(check)).head)
    assert(verdicts.nonEmpty)
    // Summed over windows, the conditioned counters equal the batch run.
    val batch = CheckSuite.runBatched(events, Seq(check)).head
    assert(verdicts.map(_._2.elementCount).sum == batch.elementCount)
    assert(verdicts.map(_._2.unexpectedCount).sum == batch.unexpectedCount)
    // And the basis is genuinely restricted: fewer elements than rows.
    assert(batch.elementCount < events.count())
  }

  test("duplicate check names are rejected — windowed columns derive from names") {
    val e = intercept[IllegalArgumentException] {
      graft.stream.StreamingSuite.windowedChecks(
        Tables.events(spark, sfDir), "ts", "1 hour", "0 seconds",
        Seq(BetweenCheck("value", min = Some(0.0)),
          BetweenCheck("value", max = Some(10.0))))
    }
    assert(e.getMessage.contains("between_value"))
  }

  test("streaming and batch agree on the same fused checks") {
    // The events parquet replayed as a bounded stream: every window's
    // element_count must sum to the batch row count.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, sfDir)
    val input = MemoryStream[(Timestamp, Double)]
    batch.select(col("ts"), col("value")).collect()
      .foreach(r => input.addData((r.getTimestamp(0), r.getDouble(1))))
    val stream = input.toDF().toDF("ts", "value")

    val counts = mutable.Buffer[Long]()
    val dir = Files.tmp("graft-stream-batch-eq")
    val query = StreamingSuite.writer(
      stream, "ts", "1 day", "0 seconds", Seq(RowCountCheck()), "graft-stream-eq") {
      (_, rs) => counts.synchronized { counts += rs.head.elementCount }
    }.option("checkpointLocation", dir).start()
    try {
      query.processAllAvailable()
      // Close every window: one far-future event.
      input.addData((Timestamp.valueOf("2100-01-01 00:00:00"), 0.0))
      query.processAllAvailable()
      assert(counts.sum == batch.count())
      assert(counts.size >= 2, "expected multiple event-time windows in testdata")
    } finally query.stop()
  }
}

object Files {
  def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
