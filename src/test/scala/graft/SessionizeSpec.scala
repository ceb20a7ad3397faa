package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Sessionize

class SessionizeSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String, Double)*) =
    df(rows.map { case (id, sec, et, v) =>
      Row(id, new Timestamp(sec * 1000L), 1L, et, v, "{}")
    }, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  test("gaps strictly over the threshold start new sessions") {
    // gaps: 100 (in), 3600 (boundary — stays IN, strict >), 3601 (out)
    val e = ev((1L, 1000L, "a", 1.0), (2L, 1100L, "b", 2.0),
      (3L, 4700L, "c", 3.0), (4L, 8301L, "d", 4.0))
    val s = Sessionize.assign(e, gapSeconds = 3600L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("sessions are per user; summary rolls up counts, bounds, value") {
    val rows = Seq(
      (1L, 1000L, 10L), (2L, 2000L, 10L), (3L, 90000L, 10L), // u10: 2 sessions
      (4L, 1500L, 20L))                                      // u20: 1 session
    val e = df(rows.map { case (id, sec, u) =>
      Row(id, new Timestamp(sec * 1000L), u, "t", 1.5, "{}")
    }, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")
    val out = Sessionize.summary(e, gapSeconds = 43200L).collect()
    assert(out.length == 3)
    val u10s1 = out.find(r => r.getLong(0) == 10L && r.getLong(1) == 1L).get
    assert(u10s1.getAs[Long]("n_events") == 2L)
    assert(u10s1.getAs[Long]("duration_s") == 1000L)
    assert(u10s1.getAs[Double]("total_value") == 3.0)
    val u10s2 = out.find(r => r.getLong(0) == 10L && r.getLong(1) == 2L).get
    assert(u10s2.getAs[Long]("n_events") == 1L &&
      u10s2.getAs[Long]("duration_s") == 0L)
  }

  test("assignment is partitioning-invariant (total order on ties)") {
    val e = Tables.events(spark, sfDir)
    val a = Sessionize.summary(e, gapSeconds = 43200L).collect()
    val b = Sessionize.summary(e.repartition(13), gapSeconds = 43200L).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length > e.select("user_id").distinct().count(),
      "expected multiple sessions for at least one user at the sf gap profile")
  }

  test("bad gap is rejected") {
    intercept[IllegalArgumentException] {
      Sessionize.assign(ev((1L, 1000L, "a", 1.0)), gapSeconds = 0L)
    }
  }
}
