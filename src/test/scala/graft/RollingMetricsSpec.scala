package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.ext.RollingMetrics

class RollingMetricsSpec extends SparkSpec {

  private def t(day: Int, h: Int = 9) = Timestamp.valueOf(
    f"2024-01-$day%02d $h%02d:00:00")
  private val ddl = "ts TIMESTAMP, event_type STRING, value DOUBLE"

  test("RANGE framing: a calendar gap shrinks the trailing window " +
       "instead of silently widening it across the gap") {
    // Days 1, 2, then a gap, then day 10. A 3-day ROW frame would pull
    // days 1-2 into day 10's window; RANGE over epoch-day must not.
    val rows = Seq(
      Row(t(1), "a", 10.0), Row(t(2), "a", 20.0), Row(t(10), "a", 40.0))
    val out = RollingMetrics.rolling(df(rows, ddl), days = 3).collect()
      .map(r => r.getAs[String]("dt") ->
        (r.getAs[Long]("n_7d"), r.getAs[Double]("value_sum_7d"),
          r.getAs[Long]("n_days_7d"))).toMap
    assert(out("2024-01-01") == ((1L, 10.0, 1L)))
    assert(out("2024-01-02") == ((2L, 30.0, 2L)))
    assert(out("2024-01-10") == ((1L, 40.0, 1L)),
      s"the gap day must stand alone, got ${out("2024-01-10")}")
  }

  test("types never mix; cent-precision values sum exactly in the " +
       "window") {
    val rows = Seq(
      Row(t(1), "a", 0.1), Row(t(2), "a", 0.2), Row(t(2), "b", 99.99))
    val out = RollingMetrics.rolling(df(rows, ddl), days = 7).collect()
      .map(r => (r.getString(0), r.getAs[String]("dt")) ->
        r.getAs[Double]("value_sum_7d")).toMap
    // 0.1 + 0.2 sums in DECIMAL: exactly 0.30, not 0.30000000000000004.
    assert(out(("a", "2024-01-02")) == 0.3)
    assert(out(("b", "2024-01-02")) == 99.99)
  }

  test("the registered query is dense where the corpus is: 30 days x " +
       "5 types, every 7-day count monotone ramps then saturates") {
    val out = Queries.x47RollingMetrics(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days_7d") >= 1L &&
        r.getAs[Long]("n_days_7d") <= 7L)
      assert(r.getAs[Long]("n_7d") >= r.getAs[Long]("n_events"))
    }
  }
}
