package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def l(rows: (Long, Long, Long)*) =
    df(rows.map { case (id, u, t) => Row(id, u, sec(t)) },
      "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")

  private def r(rows: (Long, Long, Long, Long)*) = // (user, idx, start, end)
    df(rows.map { case (u, i, s, e) => Row(u, i, sec(s), sec(e)) },
      "user_id BIGINT, session_idx BIGINT, start_ts TIMESTAMP, end_ts TIMESTAMP")

  test("inclusive bounds, no cross-key matches, outside rows drop") {
    val out = RangeJoin.rangeJoin(
        l((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 201L), (4L, 8L, 150L)),
        r((7L, 1L, 100L, 200L)),
        "user_id", "ts", "start_ts", "end_ts", binSeconds = 50L)
      .select("event_id", "session_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // Both endpoints inclusive; 201 outside; user 8 never matches.
    assert(out == Set((1L, 1L), (2L, 1L)))
  }

  test("inverted intervals drop instead of crashing (ADVICE r8)") {
    // BETWEEN matches nothing on end < start, but sequence() THROWS on
    // a descending range — one malformed right row must not kill the
    // job. The well-formed interval still matches.
    val out = RangeJoin.rangeJoin(
        l((1L, 7L, 150L)),
        r((7L, 1L, 100L, 200L), (7L, 2L, 500L, 400L)),
        "user_id", "ts", "start_ts", "end_ts", binSeconds = 50L)
      .select("event_id", "session_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 1L)))
  }

  test("intervals spanning many bins still match; overlaps multiply") {
    val out = RangeJoin.rangeJoin(
        l((1L, 7L, 500L)),
        r((7L, 1L, 0L, 1000L), (7L, 2L, 400L, 600L)),
        "user_id", "ts", "start_ts", "end_ts", binSeconds = 10L)
      .select("session_idx").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L), "both containing intervals must match")
  }

  test("bin width is result-invisible") {
    val left = l((1L to 50L).map(i => (i, i % 3, i * 37L)): _*)
    val right = r((0L to 2L).flatMap(u =>
      Seq((u, 1L, 0L, 500L), (u, 2L, 800L, 1500L))): _*)
    def run(bin: Long) = RangeJoin.rangeJoin(left, right,
        "user_id", "ts", "start_ts", "end_ts", binSeconds = bin)
      .select("event_id", "session_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(run(7L) == run(1000L) && run(7L).nonEmpty)
  }

  test("registered x22: sessions partition events — exactly one match each") {
    val out = Queries.x22RangeJoin(spark, sfDir).collect()
    val n = Tables.events(spark, sfDir).count()
    assert(out.length == n, s"expected $n single-session matches, got ${out.length}")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }
}
