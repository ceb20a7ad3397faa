package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{EventFunnel, Sessionize}

class SessionFunnelSpec extends SparkSpec {

  private def t(s: Long): Timestamp = new Timestamp(s * 1000L)
  private val ddl =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"

  private def sessionFunnel(rows: Seq[Row], gapSeconds: Long) = {
    val sess = Sessionize.assign(df(rows, ddl), gapSeconds)
      .withColumn("session_key",
        concat_ws(":", col("user_id"), col("session_idx")))
    EventFunnel.funnel(sess, Seq("view", "click"),
        userCol = "session_key")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("a session boundary breaks a conversion the lifetime funnel " +
       "counts — the semantic X37 cannot express") {
    // user 1: view at 0, click at 5000 — same LIFETIME, but a 1000 s
    // gap splits them into two sessions: no session conversion.
    // user 2: view at 0, click at 500 — inside one session: converts.
    val rows = Seq(
      Row(1L, t(0), 1L, "view"), Row(2L, t(5000), 1L, "click"),
      Row(3L, t(0), 2L, "view"), Row(4L, t(500), 2L, "click"))
    val bySession = sessionFunnel(rows, gapSeconds = 1000L)
    assert(bySession(1L) == 2L && bySession(2L) == 1L,
      s"got $bySession — only user 2's click is in-session")
    val lifetime = EventFunnel.funnel(df(rows, ddl),
        Seq("view", "click")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(lifetime(2L) == 2L, "the lifetime funnel counts both users")
    // A generous gap converges the two readings.
    assert(sessionFunnel(rows, gapSeconds = 10000L)(2L) == 2L)
  }

  test("per step, session conversions never exceed lifetime user " +
       "conversions times sessions-per-user on the events table") {
    val out = Queries.x45SessionFunnel(spark, sfDir).collect()
    assert(out.length == 3)
    val n = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // Funnel monotonicity: each step's population contains the next's.
    assert(n(1L) >= n(2L) && n(2L) >= n(3L))
    assert(out.head.getLong(3) == 1000000L, "step 1 is the ppm basis")
  }
}
