package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.ext.Concurrency

class ConcurrencySpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)
  private val ddl =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"

  test("closed intervals: touching sessions overlap at the instant; " +
       "midnight spans count on both days from a clipped sweep") {
    // gap 3600 s: user 1 has sessions [09:00, 09:30] and (after a
    // 2 h silence) [11:30, 11:40]; user 2 has [09:30, 10:00] — at
    // 09:30 user 1's first session ENDS as user 2's starts: closed
    // intervals → both active, peak 2.
    // User 3 spans midnight: [23:50 day1, 00:20 day2]; user 4 is
    // active [00:10, 00:15] day2 → day2 peak 2, and day1 counts the
    // spanning session too.
    val rows = Seq(
      Row(1L, t("2024-01-01 09:00:00"), 1L, "view", 1.0),
      Row(2L, t("2024-01-01 09:30:00"), 1L, "view", 1.0),
      Row(3L, t("2024-01-01 11:30:00"), 1L, "view", 1.0),
      Row(4L, t("2024-01-01 11:40:00"), 1L, "view", 1.0),
      Row(5L, t("2024-01-01 09:30:00"), 2L, "view", 1.0),
      Row(6L, t("2024-01-01 10:00:00"), 2L, "view", 1.0),
      Row(7L, t("2024-01-01 23:50:00"), 3L, "view", 1.0),
      Row(8L, t("2024-01-02 00:20:00"), 3L, "view", 1.0),
      Row(9L, t("2024-01-02 00:10:00"), 4L, "view", 1.0),
      Row(10L, t("2024-01-02 00:15:00"), 4L, "view", 1.0))
    val out = Concurrency.dailyPeak(df(rows, ddl), gapSeconds = 3600L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("2024-01-01") == ((4L, 2L)), s"got ${out("2024-01-01")}")
    assert(out("2024-01-02") == ((2L, 2L)), s"got ${out("2024-01-02")}")
  }

  test("the two-level sweep is partitioning-invariant and peaks never " +
       "exceed session counts on the events table") {
    val ev = Tables.events(spark, sfDir)
    val a = Concurrency.dailyPeak(ev, 43200L).collect().map(_.toSeq)
    val b = Concurrency.dailyPeak(ev.repartition(17), 43200L)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    a.foreach { r =>
      assert(r(2).asInstanceOf[Long] >= 1L &&
        r(2).asInstanceOf[Long] <= r(1).asInstanceOf[Long])
    }
  }
}
