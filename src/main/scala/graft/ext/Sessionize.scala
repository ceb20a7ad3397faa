package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X18 — event sessionization (gaps-and-islands): group each user's
  * event stream into sessions separated by inactivity gaps larger than
  * `gapSeconds` — the canonical event-log preparation step (funnel
  * analytics, per-session QA bounds, session-level training examples
  * from interaction logs).
  *
  * Definition (the standard one, engine-replayable): an event STARTS a
  * new session iff it is the user's first event or its gap to the
  * previous event is > gap (strictly — an exactly-gap-long pause stays
  * in-session, matching the SQL `>` replay). `session_idx` is the
  * 1-based running count of session starts per user in time order.
  *
  * Scale shape: ONE shuffle on `user_id` (the Window partition key) and
  * a within-partition sort — there are millions of users at any real
  * scale, so the partitioning is fine-grained; this is the case where
  * `Window.partitionBy` is RIGHT (contrast `Anomaly.zscoreFlags`, which
  * avoids a window precisely because its group count is tiny). The
  * summary is then a partial-agg `groupBy(user, session)` over the same
  * partitioning — AQE coalesces the already-partitioned exchange, so
  * the session assignment and the rollup ride one shuffle.
  *
  * Ties (equal ts within a user) are ordered by `event_id` — a total
  * order, so results are deterministic and partitioning-invariant.
  */
object Sessionize {

  /** Per-event session assignment: input columns plus
    * `session_idx` (1-based per user) and `gap_s` (seconds since the
    * user's previous event; null for the first). */
  def assign(events: DataFrame, gapSeconds: Long,
             userCol: String = "user_id", tsCol: String = "ts",
             tieCol: String = "event_id"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds ($gapSeconds) must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    // Integer-second gap via unix_timestamp: exact long arithmetic in
    // both engines (micro-precision timestamps floor to whole seconds
    // identically); `>` on nulls is false, so the first event starts a
    // session via the explicit isNull arm.
    val prev = lag(col(tsCol), 1).over(w)
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(prev)
    events
      .withColumn("gap_s", gap)
      .withColumn("session_idx",
        sum(when(col("gap_s").isNull || col("gap_s") > gapSeconds, 1L)
          .otherwise(0L)).over(w))
  }

  /** Per-session rollup: (user_id, session_idx, n_events, start_ts,
    * end_ts, duration_s, total_value), time-ordered per user. */
  def summary(events: DataFrame, gapSeconds: Long,
              userCol: String = "user_id", tsCol: String = "ts",
              tieCol: String = "event_id",
              valueCol: String = "value"): DataFrame =
    assign(events, gapSeconds, userCol, tsCol, tieCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_s"),
        // DECIMAL accumulation (the d-series discipline): a double sum
        // is order-dependent across engines; decimal is exact. The
        // ROUND happens in decimal space too (ADVICE r12): rounding
        // after the double cast lets a half-cent sum whose shortest
        // double representation falls below .xx5 round DOWN here while
        // the oracle's decimal round goes UP.
        round(sum(col(valueCol).cast("decimal(18,4)")), 2).cast("double")
          .as("total_value"))
      .orderBy(col(userCol), col("session_idx"))
}
