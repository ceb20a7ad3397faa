package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Plan-shape regression tests over EVERY registered query: the scale
  * properties the engine is designed around, enforced by CI rather than
  * by one-off explain() audits. Runs on sf0.001 — plan shapes, not data. */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan

  /** Full traversal that descends through AQE wrappers and query stages
    * (a plain `plan.collect` stops at AdaptiveSparkPlanExec, silently
    * turning scan/join assertions vacuous). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] =
    allNodes(p).collect { case b: BatchScanExec => b }

  private def planNodes(p: SparkPlan): Seq[String] = allNodes(p).map(_.nodeName)

  /** Queries whose broadcast-nested-loop joins are intentional:
    * g3 joins two ONE-ROW aggregates; brute-force top-k broadcasts the
    * bounded query set against the corpus scan (a non-equi join by
    * design). */
  private val bnljAllowed = Set("g3_in_set", "x2_topk_cosine")

  test("no registered query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!planNodes(planOf(name)).exists(_.contains("CartesianProduct")),
        s"$name plans a CartesianProduct")
    }
  }

  test("broadcast-nested-loop joins appear only where intended") {
    SparkEntry.queries.keys.filterNot(bnljAllowed).foreach { name =>
      assert(!planNodes(planOf(name)).exists(_.contains("BroadcastNestedLoopJoin")),
        s"$name plans an unexpected BroadcastNestedLoopJoin")
    }
  }

  test("every parquet scan is column-pruned (≤ 6 of lineitem's 11 columns etc.)") {
    var scansSeen = 0
    SparkEntry.queries.keys.foreach { name =>
      scansOf(planOf(name)).foreach { b =>
        scansSeen += 1
        assert(b.schema.size <= 6,
          s"$name has a parquet scan reading ${b.schema.size} columns — pruning regressed")
      }
    }
    assert(scansSeen > 30, s"audit must actually see the scans (saw $scansSeen)")
  }

  test("the mart join does not pin a broadcast on the customer side") {
    // Customer scales with the fact data (VERDICT round-1 scale-killer):
    // only fixed-cardinality nation/region may sit under a static
    // broadcast. Inspect every BroadcastExchange subtree's scans.
    val broadcastScans = allNodes(planOf("t3_mart_sales"))
      .filter(_.nodeName.contains("BroadcastExchange"))
      .flatMap(scansOf)
      .map(_.schema.fieldNames.toSeq)
    assert(broadcastScans.nonEmpty, "expected nation/region broadcasts")
    broadcastScans.foreach { cols =>
      assert(!cols.exists(c => c.startsWith("c_") || c.startsWith("l_")),
        s"fact-scaled columns $cols under a static BroadcastExchange in t3")
    }
  }

  test("fused check suites compile to a single aggregate over one scan") {
    import graft.checks._
    val checks: Seq[AggCheck] = Seq(RowCountCheck(), NotNullCheck("o_custkey"),
      BetweenCheck("o_totalprice", min = Some(0.0)))
    val cols = checks.flatMap(c => c.aggColumns(c.safeName + "__"))
    val df: DataFrame = Tables.orders(spark, sfDir).agg(cols.head, cols.tail: _*)
    assert(scansOf(df.queryExecution.executedPlan).size == 1,
      "a fused suite must cost exactly one scan")
  }

  test("fuzzy-dedup and IVF pipelines are cartesian-free (pre-materialization plans)") {
    // The registered variants localCheckpoint their outputs, which
    // replaces the inspectable plan with a checkpoint scan — audit the
    // real shapes via materialize = false / the pure probe path.
    import graft.ext.{Dedup, IvfIndex}
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.build(emb, k = 4, iters = 0)
    try {
      val plans = Seq(
        "jaccard" -> Dedup.jaccardPairs(docs, n = 4, materialize = false),
        "minhash" -> Dedup.minhashPairs(docs, n = 4, bands = 8, materialize = false),
        "simhash" -> Dedup.simhashPairs(docs, n = 4, maxHamming = 6, materialize = false),
        "ivf" -> IvfIndex.topK(model, emb, emb.filter("vec_id < 3"), k = 3, nProbe = 2))
      plans.foreach { case (name, df) =>
        val nodes = planNodes(df.queryExecution.executedPlan)
        assert(!nodes.exists(_.contains("CartesianProduct")), s"$name plans a cartesian")
        assert(!nodes.exists(_.contains("BroadcastNestedLoopJoin")),
          s"$name plans a nested-loop join")
      }
    } finally model.release()
  }

  test("whitelist anti-membership pushes its predicate into the scan") {
    val d4 = SparkEntry.queries("d4_whitelist_violations")(spark, sfDir)
    val scanStr = scansOf(d4.queryExecution.executedPlan)
      .map(_.toString).mkString("\n")
    assert(scanStr.contains("n_name"),
      "expected the NOT-IN predicate pushed toward the nation scan")
  }
}
