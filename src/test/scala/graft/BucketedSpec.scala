package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.sources.Bucketed

class BucketedSpec extends SparkSpec {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def writePair(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_spec")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "n_chars")
    val meta = Tables.documents(spark, sfDir).select("doc_id", "lang")
    Bucketed.writeBucketed(docs, "bkt_spec_docs", s"$dir/docs", "doc_id", 4)
    Bucketed.writeBucketed(meta, "bkt_spec_meta", s"$dir/meta", "doc_id", 4)
    ("bkt_spec_docs", "bkt_spec_meta")
  }

  test("co-located join of two bucketed tables plans ZERO Exchange " +
       "and scans read the buckets") {
    val (dn, mn) = writePair()
    val (d, m) = (Bucketed.table(spark, dn), Bucketed.table(spark, mn))
    val joined = Bucketed.colocatedJoin(d, m, d("doc_id") === m("doc_id"))
    val nodes = allNodes(joined.queryExecution.executedPlan)
    assert(!nodes.exists(_.nodeName.contains("Exchange")),
      "bucketed co-located join must not shuffle either side")
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      s"expected two bucketed scans, got ${scans.map(_.bucketedScan)}")
    assert(nodes.exists(_.nodeName.contains("SortMergeJoin")),
      "the pinned strategy is a sort-merge join")
  }

  test("one file per bucket: repartition-by-bucket-key before the " +
       "write routes each bucket through one task") {
    val (dn, _) = writePair()
    val loc = spark.sql(s"DESCRIBE FORMATTED $dn").collect()
      .find(_.getString(0) == "Location").get.getString(1)
    val files = new java.io.File(new java.net.URI(loc)).listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.length == 4, s"expected 4 bucket files, got ${files.length}")
  }

  test("the layout is result-invisible: bucketed join equals the " +
       "plain parquet join, row for row") {
    val (dn, mn) = writePair()
    val (d, m) = (Bucketed.table(spark, dn), Bucketed.table(spark, mn))
    val got = Bucketed.colocatedJoin(d, m, d("doc_id") === m("doc_id"))
      .select(d("doc_id"), col("source"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    val docs = Tables.documents(spark, sfDir)
    val expected = docs.select("doc_id", "source", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.sameElements(expected))
  }

  test("registered x28_bucketed_join: every segment populated, " +
       "plan exchange-free below the aggregation") {
    val out = Queries.x28BucketedJoin(spark, sfDir)
    val rows = out.collect()
    assert(rows.length >= 3 && rows.forall(_.getLong(1) > 0))
    // The only exchanges allowed are the groupBy's own — the JOIN
    // itself must not have shuffled: no Exchange may sit BELOW the
    // sort-merge join node.
    val nodes = allNodes(out.queryExecution.executedPlan)
    val smj = nodes.find(_.nodeName.contains("SortMergeJoin"))
    assert(smj.isDefined, "expected the pinned sort-merge join")
    assert(!allNodes(smj.get).drop(1).exists(_.nodeName.contains("Exchange")),
      "the bucketed join's inputs must arrive without a shuffle")
  }
}
