package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.RobustStats

class RobustStatsSpec extends SparkSpec {

  private val ddl = "event_type STRING, value DOUBLE"

  test("small fixture: exact doubled median and MAD, including the " +
       "x.5 interpolated case; the planted monster flags") {
    // group a, even count: values 1, 2, 3, 1000000 → median 2.5
    // (med2 = 50000 scaled), deviations |2v − med2| /10⁴ = 1.5, 0.5,
    // 0.5, 999997.5 → doubled-MAD over dev2 {30000, 10000, 10000,
    // 19999950000}: sorted middle pair (10000, 30000) → MAD2 = 40000.
    // Outlier test 2·dev2 > 3·mad2: only the monster (and v=1:
    // 60000 > 120000 false).
    val rows = Seq(
      Row("a", 1.0), Row("a", 2.0), Row("a", 3.0), Row("a", 1000000.0),
      Row("b", 5.0), Row("b", 5.0), Row("b", 5.0))
    val out = RobustStats.madCensus(df(rows, ddl)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((4L, 50000L, 40000L, 1L)), s"got ${out("a")}")
    // constant group: MAD 0, nothing flags (0 > 0 false).
    assert(out("b") == ((3L, 100000L, 0L, 0L)), s"got ${out("b")}")
  }

  test("breakdown: one 10^6x monster does not drag the median screen " +
       "the way it drags a z-score") {
    // 20 clean values + 1 monster: MAD stays at the clean spread, so
    // the monster flags. The z-score sigma is monster-dominated — the
    // same row sits under 1 sigma and would NOT flag at z > 3.
    val clean = (1 to 20).map(i => Row("a", 100.0 + (i % 5)))
    val rows = clean :+ Row("a", 1.0e9)
    val flags = RobustStats.madFlags(df(rows, ddl))
    assert(flags.filter(col("is_outlier")).count() == 1L)
    assert(flags.filter(col("is_outlier") &&
      col("value") > 1.0e8).count() == 1L)
  }

  test("census is partitioning-invariant on the events table") {
    val ev = Tables.events(spark, sfDir)
    val a = RobustStats.madCensus(ev).collect().map(_.toSeq)
    val b = RobustStats.madCensus(ev.repartition(11)).collect()
      .map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }
}
