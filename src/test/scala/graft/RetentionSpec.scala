package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Retention

class RetentionSpec extends SparkSpec {

  test("small fixture: cohorts by first day, offsets count distinct " +
       "actives, ppm floors, offset-0 equals cohort size") {
    val ddl = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    def t(day: Int, h: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-$day%02d $h%02d:00:00")
    val rows = Seq(
      // cohort 01-01: users 1, 2, 3. User 1 returns day 2 and 3 (twice
      // in one day — must count once); user 2 returns day 3 only.
      Row(1L, t(1, 9), 1L), Row(2L, t(1, 10), 2L), Row(3L, t(1, 11), 3L),
      Row(4L, t(2, 9), 1L),
      Row(5L, t(3, 9), 1L), Row(6L, t(3, 10), 1L), Row(7L, t(3, 11), 2L),
      // cohort 01-02: user 4 only, never returns.
      Row(8L, t(2, 12), 4L))
    val out = Retention.cohortRetention(df(rows, ddl)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 3L, 3L, 1000000L),
      ("2024-01-01", 1L, 1L, 3L, 333333L),
      ("2024-01-01", 2L, 2L, 3L, 666666L),
      ("2024-01-02", 0L, 1L, 1L, 1000000L)),
      s"got:\n${out.mkString("\n")}")
  }

  test("offset-0 n_active equals cohort_size on the events table, and " +
       "every row's cohort is a real minimum") {
    val out = Retention.cohortRetention(Tables.events(spark, sfDir))
    assert(out.filter(col("day_offset") === 0L &&
      col("n_active") =!= col("cohort_size")).count() == 0L)
    assert(out.filter(col("day_offset") < 0L).count() == 0L,
      "an offset below zero would mean a pre-cohort activity day — " +
        "impossible if the cohort is the true minimum")
    assert(out.count() > 0)
  }
}
