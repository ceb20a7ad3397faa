package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Calibrate

class CalibrateSpec extends SparkSpec {

  private def pctls(d: org.apache.spark.sql.DataFrame) =
    d.select("g", "doc_id", "pctl_ppm").collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("census+CDF percentiles equal the naive cume_dist window, " +
       "any partitioning, both join modes") {
    // Skewed groups, duplicate scores (peers must share a percentile),
    // a null score, a null group (a real stratum).
    val data = (1L to 400L).map(i => Row("big", i, i % 10)) ++
      Seq(Row("small", 1001L, 5L), Row("small", 1002L, 7L),
        Row("small", 1003L, null), Row(null, 2001L, 1L))
    val d = df(data, "g STRING, doc_id BIGINT, s BIGINT")
    // cume_dist itself multiplied out in doubles can floor one low
    // (0.3·10⁶ = 299999.999…), so the naive reference uses the same
    // integer arithmetic over exact count windows: the RANGE frame
    // includes all order-peers, which IS cume_dist's inclusive count.
    val byG = Window.partitionBy("g")
    val naive = d.filter(col("s").isNotNull)
      .withColumn("__cum", count(lit(1)).over(byG.orderBy("s")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", count(lit(1)).over(byG))
      .withColumn("pctl_ppm", expr("(__cum * 1000000) div __tot"))
      .drop("__cum", "__tot")
      .unionByName(d.filter(col("s").isNull)
        .withColumn("pctl_ppm", lit(null).cast("long")))
    val expected = pctls(naive)
    for (p <- Seq(1, 3, 17); bc <- Seq(true, false)) {
      val got = pctls(Calibrate.scorePercentiles(
        d.repartition(p), "s", "g", broadcastCdf = bc))
      assert(got.sameElements(expected), s"partitions=$p broadcast=$bc")
    }
  }

  test("gate semantics: max score is exactly 1e6, null never kept, " +
       "verdict is the ppm comparison") {
    val d = df(Seq(Row("a", 1L, 10L), Row("a", 2L, 20L), Row("a", 3L, 30L),
      Row("a", 4L, null)), "g STRING, doc_id BIGINT, s BIGINT")
    val out = Calibrate.percentileGate(d, "s", "g", minPpm = 500000L)
      .select("doc_id", "pctl_ppm", "is_kept").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    // cum_le/total over 3 real scores: 1/3, 2/3, 3/3 → floored ppm.
    assert(out sameElements Array(
      (1L, 333333L, false), (2L, 666666L, true), (3L, 1000000L, true),
      (4L, -1L, false)))
  }

  test("registered x27_score_percentile: bottom decile dropped per " +
       "source, survivors' percentiles all above the cut") {
    val out = Queries.x27ScorePercentile(spark, sfDir)
    val bySource = out.groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(when(col("is_kept"), 1L).otherwise(0L)).as("kept"),
        min(when(col("is_kept"), col("pctl_ppm"))).as("min_kept_ppm"),
        max(when(!col("is_kept"), col("pctl_ppm"))).as("max_drop_ppm"))
      .collect()
    assert(bySource.nonEmpty)
    bySource.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept > 0 && kept <= n, s"${r.getString(0)}: kept=$kept n=$n")
      assert(r.getLong(3) >= 100000L, "a survivor sits below the cut")
      if (!r.isNullAt(4))
        assert(r.getLong(4) < 100000L, "a dropped row sits above the cut")
    }
    // The plan is the staged shape: the corpus side carries no window —
    // every Window node must sit above the dim-sized census aggregate.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "census aggregate missing")
  }
}
