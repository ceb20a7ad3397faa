package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X48 — interval-sweep concurrency: the maximum number of
  * simultaneously-active sessions per UTC day — the capacity-planning
  * and abuse-detection number ("how many live sessions must the
  * serving tier hold") that session COUNTS cannot answer: 1000
  * sequential sessions and 1000 simultaneous ones count the same.
  *
  * Semantics: sessions are CLOSED intervals [start_ts, end_ts]; at an
  * instant where one session ends exactly as another starts, both are
  * active (+1 sorts before −1 at equal timestamps). A session spanning
  * midnight contributes to every day it touches (clipped per day, so
  * each day's sweep is self-contained and starts at zero).
  *
  * The scale problem is the sweep itself: a running sum over ALL the
  * corpus's (+1/−1) points in time order is a single global ordered
  * scan. Banding by day is not enough — one hot day still funnels one
  * reducer — so the sweep is TWO-LEVEL (the X9/X39 hierarchical-scan
  * discipline on the time axis): within-(day, hour) running sums
  * (parallel across 24× more partitions), plus per-day hour-offset
  * prefix sums over the 24-row-per-day hour-total census. The max of
  * (hour offset + local running) equals the max of the global
  * running sum exactly — integer sums regroup associatively — and a
  * plain one-window-per-day replay is the oracle's form.
  */
object Concurrency {

  /** Per-day (dt, n_sessions, max_concurrent) from an event log:
    * sessions via [[Sessionize.summary]] at `gapSeconds`. */
  def dailyPeak(events: DataFrame, gapSeconds: Long): DataFrame = {
    val sessions = Sessionize.summary(events, gapSeconds)
      .select(col("user_id"), col("session_idx"),
        col("start_ts"), col("end_ts"))
    // Explode each session to the UTC days it touches; clip the
    // interval to the day so each day's sweep is self-contained.
    val byDay = sessions
      .withColumn("__day", explode(sequence(
        to_date(col("start_ts")), to_date(col("end_ts")))))
      .withColumn("__day_start", col("__day").cast("timestamp"))
      .withColumn("__next_day",
        date_add(col("__day"), 1).cast("timestamp"))
      .withColumn("__s", greatest(col("start_ts"), col("__day_start")))
      .withColumn("__e", least(col("end_ts"), col("__next_day")))
    // Sweep points: +1 at the clipped start, −1 at the clipped end.
    val points = byDay.select(col("__day"), col("__s").as("__ts"),
        lit(1L).as("__d"), col("user_id"), col("session_idx"))
      .unionByName(byDay.select(col("__day"), col("__e").as("__ts"),
        lit(-1L).as("__d"), col("user_id"), col("session_idx")))
      .withColumn("__hour", hour(col("__ts")) +
        when(col("__ts") === col("__day").cast("timestamp") + expr("INTERVAL 1 DAY"),
          lit(24)).otherwise(lit(0)))
    // Level 1: within-(day, hour) running sums. The tie order among
    // equal (ts, delta) rows cannot move the peak (the partial sums
    // pass through the same values in any order of equal deltas);
    // (+1 before −1) at equal ts is the closed-interval contract.
    val order = Seq(col("__ts").asc, col("__d").desc,
      col("user_id").asc, col("session_idx").asc)
    val localW = Window.partitionBy(col("__day"), col("__hour"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = points.withColumn("__run", sum(col("__d")).over(localW))
    // Level 2: hour offsets — a 24-row-per-day census prefix.
    val hourW = Window.partitionBy(col("__day")).orderBy(col("__hour"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = points.groupBy(col("__day"), col("__hour"))
      .agg(sum(col("__d")).as("__ht"))
      .withColumn("__off", coalesce(sum(col("__ht")).over(hourW), lit(0L)))
      .select(col("__day"), col("__hour"), col("__off"))
    local.join(broadcast(offsets), Seq("__day", "__hour"))
      .groupBy(col("__day"))
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_sessions"),
        max(col("__off") + col("__run")).as("max_concurrent"))
      .select(date_format(col("__day"), "yyyy-MM-dd").as("dt"),
        col("n_sessions"), col("max_concurrent"))
      .orderBy("dt")
  }
}
