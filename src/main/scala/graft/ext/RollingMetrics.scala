package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X47 — rolling time-series metrics: the trailing-window view
  * (7-day rolling event count / value mass) every operations dashboard
  * and drift monitor reads — the windowed complement of X35's
  * per-day census and X20's week-vs-baseline PSI.
  *
  * Exactness: the window frame is `RANGE BETWEEN (days−1) PRECEDING`
  * over the INTEGER epoch-day — range (not row) framing, so calendar
  * gaps are handled without materializing a dense day spine (a
  * row-framed window over observed days silently widens across gaps —
  * the classic rolling-metric bug); both engines implement identical
  * RANGE semantics over integers. Money stays DECIMAL through both
  * the daily census AND the window sum, rounding once at the edge
  * (the d-series discipline — rolling-summing pre-rounded 2-dp days
  * would drift from the oracle's raw-decimal sum).
  *
  * Scale shape: ONE partial-agg shuffle collapses the event stream to
  * the (type, day) census — dim-sized at any corpus (types × days) —
  * and every window after it runs over that census partitioned by
  * type: the corpus never sees a window.
  */
object RollingMetrics {

  def rolling(events: DataFrame, days: Int = 7,
              tsCol: String = "ts", typeCol: String = "event_type",
              valueCol: String = "value"): DataFrame = {
    require(days >= 1, s"days ($days) must be >= 1")
    val daily = events
      .withColumn("dt", to_date(col(tsCol)))
      .groupBy(col(typeCol), col("dt"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).as("__vsum"))
      .withColumn("__day", datediff(col("dt"), to_date(lit("1970-01-01"))))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("__day"))
      .rangeBetween(-(days - 1).toLong, 0L)
    daily
      .withColumn("n_7d", sum(col("n_events")).over(w))
      .withColumn("__vsum_7d", sum(col("__vsum")).over(w))
      .withColumn("n_days_7d", count(lit(1)).over(w))
      .select(col(typeCol),
        // Date emitted as the canonical yyyy-MM-dd string (the
        // Retention/TimePartitioned output discipline — engine and
        // oracle then compare bytes, not date-type renderings).
        date_format(col("dt"), "yyyy-MM-dd").as("dt"), col("n_events"),
        round(col("__vsum"), 2).cast("double").as("value_sum"),
        col("n_7d"),
        round(col("__vsum_7d"), 2).cast("double").as("value_sum_7d"),
        col("n_days_7d"))
      .orderBy(typeCol, "dt")
  }
}
