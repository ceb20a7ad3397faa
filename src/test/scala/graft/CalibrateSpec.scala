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

  test("fitted cuts ⇔ the percentile gate: identical survivor sets at " +
       "every cut, save/load round-trips, unknown stratum fails") {
    val data = (1L to 400L).map(i => Row("big", i, i % 10)) ++
      Seq(Row("small", 1001L, 5L), Row("small", 1002L, 7L),
        Row("small", 1003L, null))
    val d = df(data, "g STRING, doc_id BIGINT, s BIGINT")
    for (ppm <- Seq(0L, 100000L, 333333L, 500000L, 1000000L)) {
      val direct = Calibrate.percentileGate(d, "s", "g", ppm)
        .filter(col("is_kept")).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      val cuts = Calibrate.thresholds(d, "s", "g", ppm)
      val viaCuts = Calibrate.gateAgainst(d, cuts, "s", "g")
        .filter(col("is_kept")).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(viaCuts.sameElements(direct), s"minPpm=$ppm diverged")
    }
    // Save → load round trip, then gate a shard with a stratum the fit
    // never saw: no distribution, no floor — it must fail the gate.
    val dir = java.nio.file.Files.createTempDirectory("graft_calib").toString
    Calibrate.save(Calibrate.thresholds(d, "s", "g", 100000L),
      "s", "g", 100000L, dir)
    val (loaded, ppm) = Calibrate.load(spark, dir,
      expectScore = Some("s"), expectGroup = Some("g"))
    assert(ppm == 100000L)
    // A probe expecting different fit columns must fail LOUDLY, not
    // gate on the wrong score scale.
    intercept[IllegalArgumentException] {
      Calibrate.load(spark, dir, expectScore = Some("n_tok"))
    }
    // Re-gating overwrites the previous verdict instead of crashing on
    // an ambiguous cut_score/is_kept reference.
    val twice = Calibrate.gateAgainst(
      Calibrate.gateAgainst(d, loaded, "s", "g"), loaded, "s", "g")
    assert(twice.columns.count(_ == "cut_score") == 1 &&
      twice.columns.count(_ == "is_kept") == 1)
    val shard = df(Seq(Row("big", 1L, 9L), Row("never_seen", 2L, 999L)),
      "g STRING, doc_id BIGINT, s BIGINT")
    val gated = Calibrate.gateAgainst(shard, loaded, "s", "g")
      .select("doc_id", "is_kept").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    assert(gated sameElements Array((1L, true), (2L, false)))
  }

  test("funnel calibCuts gate: is_quality equals the direct fitted-cut " +
       "comparison on the funnel's own n_tok") {
    import graft.ext.{Curation, TextAnalysis}
    val docs = Tables.documents(spark, sfDir)
    val cuts = Calibrate.thresholds(
      docs.select(col("lang"),
        TextAnalysis.tokenCount(col("text")).as("nt")),
      "nt", "lang", 100000L)
    val bench = docs.filter(col("doc_id") < 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val ann = Curation.annotate(docs, bench,
      Curation.Config(calibCuts = Some(cuts)))
    val bad = ann.join(broadcast(cuts), col("lang") <=> col("grp"), "left")
      .filter(col("is_quality") =!=
        (col("n_tok") >= lit(1L) &&
          coalesce(col("n_tok") >= col("cut_score"), lit(false))))
    assert(bad.count() == 0, "funnel gate diverged from the direct cut")
    // The gate actually bites: some documents fail purely on the cut.
    assert(ann.filter(!col("calib_pass") && col("n_tok") >= 1L).count() > 0)
  }

  test("gateAgainst is streaming-compatible: micro-batched shard " +
       "verdicts equal the batch gate (stream-static broadcast join, " +
       "no state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fit = df((1L to 100L).map(i => Row("en", i, i % 10)) ++
      (1L to 50L).map(i => Row("zh", 1000L + i, i % 5)),
      "g STRING, doc_id BIGINT, s BIGINT")
    val cuts = Calibrate.thresholds(fit, "s", "g", 300000L)
      .localCheckpoint(true) // the persisted-model stand-in
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("g", "doc_id", "s")
    val out = scala.collection.mutable.Buffer[(Long, Boolean)]()
    val query = Calibrate.gateAgainst(stream, cuts, "s", "g")
      .select("doc_id", "is_kept")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r => (r.getLong(0), r.getBoolean(1))); () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-calib-ckpt").toString)
      .start()
    try {
      input.addData(("en", 1L, 9L), ("en", 2L, 1L))
      query.processAllAvailable()
      input.addData(("zh", 3L, 4L), ("never_seen", 4L, 999L))
      query.processAllAvailable()
    } finally query.stop()
    val batch = Calibrate.gateAgainst(
        df(Seq(Row("en", 1L, 9L), Row("en", 2L, 1L), Row("zh", 3L, 4L),
          Row("never_seen", 4L, 999L)), "g STRING, doc_id BIGINT, s BIGINT"),
        cuts, "s", "g")
      .select("doc_id", "is_kept").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    assert(out.sortBy(_._1).toArray.sameElements(batch),
      "stream and batch verdicts diverged")
    // The fit actually cut: one en doc passes, one fails.
    assert(batch.toMap == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false))
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
