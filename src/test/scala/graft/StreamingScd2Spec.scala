package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.etl.Scd2
import graft.stream.StreamingScd2

/** S7 — streaming SCD-2 upsert: the foreachBatch engine over a REAL
  * MemoryStream must land the same dimension state as the one-shot
  * batch merge (the batch/stream contract every lane honors), and the
  * micro-batch composition property the registered query's oracle
  * parity rests on must hold for key-partitioned batches. */
class StreamingScd2Spec extends SparkSpec {

  private val d1 = Date.valueOf("2026-01-01")
  private val d2 = Date.valueOf("2026-02-01")
  private val histSchema =
    "k BIGINT, seg STRING, bal DOUBLE, valid_from DATE, valid_to DATE, " +
      "is_current BOOLEAN"

  private def key(r: Row) = (r.getLong(0), String.valueOf(r.get(1)),
    String.valueOf(r.get(2)), r.getDate(3).toString,
    String.valueOf(r.get(4)), r.getBoolean(5))

  test("live MemoryStream upsert ≡ one-shot batch merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hist = df(Seq(
        Row(1L, "A", 1.0, d1, null, true),   // will change (batch 1)
        Row(2L, "B", 2.0, d1, null, true),   // unchanged (batch 2)
        Row(3L, "C", 3.0, d1, null, true)),  // unreported
      histSchema)
    val updates = Seq((1L, "A", 9.0), (2L, "B", 2.0), (4L, "D", 4.0))

    val state = new StreamingScd2.DimState(hist)
    val input = MemoryStream[(Long, String, Double)]
    val query = StreamingScd2.run(
      input.toDF().toDF("k", "seg", "bal"), state,
      keys = Seq("k"), tracked = Seq("seg", "bal"),
      tsOf = _ => to_date(lit("2026-02-01")),
      checkpointDir = Some(Files.tmp("graft-scd2-ckpt")))
    try {
      input.addData(updates.take(1))
      query.processAllAvailable()
      input.addData(updates.drop(1))
      query.processAllAvailable()
    } finally query.stop()

    val oneShot = Scd2.snapshot(hist,
      df(updates.map(u => Row(u._1, u._2, u._3)),
        "k BIGINT, seg STRING, bal DOUBLE"),
      Seq("k"), Seq("seg", "bal"), to_date(lit("2026-02-01")))
    assert(state.current.collect().map(key).sorted.toSeq ==
      oneShot.collect().map(key).sorted.toSeq)
    // And the state is the expected history: 1 closed + re-opened at
    // d2, 2 and 3 still open at d1, 4 inserted open at d2.
    assert(state.current.filter(col("is_current")).count() == 4)
    assert(state.current.filter(!col("is_current")).collect()
      .map(key).toSeq == Seq((1L, "A", "1.0", d1.toString, d2.toString, false)))
  }

  test("upsertBatch is idempotent at a fixed ts (the at-least-once claim)") {
    // foreachBatch gives at-least-once sink semantics; the scaladoc
    // claims replays converge because the merge is idempotent at one
    // effective ts. Pin it: re-applying the same batch (with a change,
    // an insert, and an unchanged row) must leave the state identical.
    val hist = df(Seq(
        Row(1L, "A", 1.0, d1, null, true),
        Row(2L, "B", 2.0, d1, null, true)), histSchema)
    val upd = df(Seq(Row(1L, "A", 9.0), Row(2L, "B", 2.0), Row(3L, "C", 3.0)),
      "k BIGINT, seg STRING, bal DOUBLE")
    val ts = to_date(lit("2026-02-01"))
    val state = new StreamingScd2.DimState(hist)
    StreamingScd2.upsertBatch(state, upd, Seq("k"), Seq("seg", "bal"), ts)
    val once = state.current.collect().map(key).sorted.toSeq
    StreamingScd2.upsertBatch(state, upd, Seq("k"), Seq("seg", "bal"), ts)
    assert(state.current.collect().map(key).sorted.toSeq == once,
      "replaying the same micro-batch at the same ts must be a no-op")
    // The once-state is the real merge, not vacuous: 1 closed+reopened,
    // 3 inserted.
    assert(once.count(_._6) == 3 && once.count(!_._6) == 1)
  }

  test("key-partitioned micro-batches compose to the one-shot merge") {
    // The property the registered s7 query's t4-oracle parity rests
    // on: applying a key-partitioned update set as N sequential
    // upsertBatch calls at ONE effective ts equals one snapshot call.
    val hist = df((1L to 20L).map(i =>
        Row(i, s"S$i", i.toDouble, d1, null, true)), histSchema)
    val upd = df((1L to 15L).map(i =>
        Row(i, s"S$i", if (i % 3 == 0) i + 100.0 else i.toDouble)),
      "k BIGINT, seg STRING, bal DOUBLE")
    val ts = to_date(lit("2026-02-01"))

    val state = new StreamingScd2.DimState(hist)
    (0L to 4L).foreach { b =>
      StreamingScd2.upsertBatch(state, upd.filter(pmod(col("k"), lit(5L)) === b),
        Seq("k"), Seq("seg", "bal"), ts)
    }
    val oneShot = Scd2.snapshot(hist, upd, Seq("k"), Seq("seg", "bal"), ts)
    assert(state.current.collect().map(key).sorted.toSeq ==
      oneShot.collect().map(key).sorted.toSeq)
  }
}
