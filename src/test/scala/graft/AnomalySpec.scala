package graft

import graft.ext.Anomaly
import org.apache.spark.sql.Row

/** X4 z-score anomaly flags. */
class AnomalySpec extends SparkSpec {

  // Group "a": tight cluster around 10 with one wild outlier.
  // Group "b": same values as a's cluster — no outlier.
  private val events = df(
    (1 to 20).map(i => Row(i.toLong, "a", 10.0 + (i % 5) * 0.1)) ++
      Seq(Row(21L, "a", 1000.0)) ++
      (22 to 40).map(i => Row(i.toLong, "b", 10.0 + (i % 5) * 0.1)),
    "event_id BIGINT, event_type STRING, value DOUBLE")

  test("zscoreFlags flags the planted outlier and nothing else") {
    val flagged = Anomaly.zscoreFlags(events, "value", "event_type", "event_id", 3.0)
      .collect().map(_.getLong(0))
    assert(flagged.toSeq == Seq(21L))
  }

  test("zscoreFlags is per-group: identical values, different groups, different verdicts") {
    // In group b the same ~10.x values are unremarkable; in group a they
    // sit below the outlier-inflated mean but within 3 sd.
    val flags = Anomaly.zscoreFlags(events, "value", "event_type", "event_id", 0.5)
    val byGroup = flags.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byGroup.contains("b")) // with τ=0.5 group b's edges flag too
  }

  test("zscore verdicts are invariant to partitioning (exact-sum stats)") {
    // avg/stddev_samp accumulate in partition order; the exact-decimal
    // formulation must produce identical flags (and identical rounded z)
    // no matter how the data is split.
    val ev = Tables.events(spark, sfDir)
    def run(parts: Int) =
      Anomaly.zscoreFlags(ev.repartition(parts), "value", "event_type", "event_id", 3.0)
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq.sorted
    assert(run(2) == run(17))
  }

  test("anomalySummary reports per-group stats and flag counts") {
    val s = Anomaly.anomalySummary(events, "value", "event_type", "event_id", 3.0)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("flagged"))).toMap
    assert(s("a") == ((21L, 1L)))
    assert(s("b") == ((19L, 0L)))
  }

  test("anomalySummary computes the group stats once (shared via exchange reuse)") {
    // Summary columns and flag derivation consume the SAME rawStats
    // frame; the identical aggregate subtrees must collapse to one
    // executed shuffle (ReusedExchange), not two stats scans.
    val plan = Anomaly.anomalySummary(
      Tables.events(spark, sfDir), "value", "event_type", "event_id", 3.0)
    plan.collect() // AQE finalizes the physical plan on execution
    val physical = plan.queryExecution.executedPlan.toString
    assert(physical.contains("ReusedExchange") || physical.contains("ReusedQueryStage"),
      s"expected the stats aggregate's exchange to be reused:\n$physical")
  }
}
