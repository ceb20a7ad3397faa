package graft

import org.apache.spark.sql.Row

import graft.ext.Sessionize

/** X18-builtin — the native `session_window` duel (VERDICT r16 next
  * #7): the adapter (floor-second timestamps, gap+1 duration) makes
  * Spark's built-in aggregation equal the gaps-and-islands convention
  * by construction; the NAIVE built-in form provably diverges on a
  * boundary gap. The custom-state s5 lane keeps earning its
  * complexity by what the built-in lacks: per-user session ORDINALS
  * (session_window emits bounds, an extra ranking pass derives idx),
  * index continuity across timeout emissions, and the open-session
  * sentinel for exactly-once append emission on live streams. */
class SessionWindowDuelSpec extends SparkSpec {

  test("the adapted built-in equals the window formulation row-for-row " +
       "on the events corpus") {
    val a = Queries.x18Sessionize(spark, sfDir).collect().toSeq
    val b = Queries.x18SessionBuiltin(spark, sfDir).collect().toSeq
    assert(a.nonEmpty && a == b,
      s"built-in diverged: ${a.size} vs ${b.size} rows")
  }

  test("the NAIVE session_window form splits a boundary gap the " +
       "gaps-and-islands convention keeps — the documented divergence " +
       "the adapter exists for") {
    import org.apache.spark.sql.functions._
    // Two events 43200.5 s apart (sub-second timestamps, like the real
    // corpus): floor-second gap = 43200 <= threshold -> ONE session
    // under x18's strict-> rule; full-precision gap >= 12 h -> the
    // naive built-in closes the window and emits TWO.
    val gap = df(Seq(
      Row(1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.25"), 1.0),
      Row(1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00.75"), 1.0)),
      "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE")
    assert(Sessionize.summary(gap, gapSeconds = 43200L).count() == 1L)
    val naive = gap.groupBy(col("user_id"),
        session_window(col("ts"), "43200 seconds"))
      .agg(count(lit(1)).as("n")).count()
    assert(naive == 2L, s"naive built-in emitted $naive sessions, " +
      "expected the boundary split this spec documents")
    // The adapter (floor + gap+1) restores the x18 semantics.
    val adapted = gap
      .withColumn("ts_floor", timestamp_seconds(unix_timestamp(col("ts"))))
      .groupBy(col("user_id"),
        session_window(col("ts_floor"), "43201 seconds"))
      .agg(count(lit(1)).as("n")).count()
    assert(adapted == 1L)
    // And an exactly-threshold floor gap (the in-session boundary of
    // the strict-> rule) stays ONE session under both formulations.
    val exact = df(Seq(
      Row(1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      Row(1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1.0)),
      "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE")
    assert(Sessionize.summary(exact, gapSeconds = 43200L).count() == 1L)
    val exactBuiltin = exact
      .withColumn("ts_floor", timestamp_seconds(unix_timestamp(col("ts"))))
      .groupBy(col("user_id"),
        session_window(col("ts_floor"), "43201 seconds"))
      .agg(count(lit(1)).as("n")).count()
    assert(exactBuiltin == 1L)
  }
}
