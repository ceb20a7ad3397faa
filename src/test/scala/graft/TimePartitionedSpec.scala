package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.TimePartitioned

class TimePartitionedSpec extends SparkSpec {

  private def events = Tables.events(spark, sfDir)

  test("layout: one dt= directory per UTC day, at most filesPerDay " +
       "files each, content round-trips exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dt_spec").toString
    TimePartitioned.writeDaily(events, dir, filesPerDay = 2)
    val days = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
    assert(days.nonEmpty && days.forall(_.getName.matches("dt=\\d{4}-\\d{2}-\\d{2}")))
    days.foreach { d =>
      val files = d.listFiles().count(f => f.getName.endsWith(".parquet"))
      assert(files >= 1 && files <= 2,
        s"${d.getName}: $files files, expected 1..2")
    }
    val back = TimePartitioned.read(spark, dir)
    assert(back.count() == events.count())
    // Every row's dt (inferred DATE partition value) equals the UTC
    // day of its ts.
    assert(back.filter(
        date_format(col("dt"), "yyyy-MM-dd") =!=
          date_format(col("ts"), "yyyy-MM-dd")).count() == 0L)
    // Content equality beyond the count: event_id multiset matches.
    val a = back.select("event_id").collect().map(_.getLong(0)).sorted
    val b = events.select("event_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("a dt predicate prunes at the scan (PartitionFilters), and the " +
       "pruned read returns exactly that day's rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dt_prune").toString
    TimePartitioned.writeDaily(events, dir)
    val day = TimePartitioned.read(spark, dir)
      .select(date_format(col("dt"), "yyyy-MM-dd")).orderBy("dt")
      .head().getString(0)
    val q = TimePartitioned.read(spark, dir).filter(col("dt") === day)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"dt predicate did not reach the scan as a partition filter:\n$plan")
    val expect = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(q.count() == expect && expect > 0)
  }

  test("row order inside each day is input-fragmentation-invariant " +
       "(key-sorted — the Compact contract)") {
    val base = java.nio.file.Files.createTempDirectory("graft_dt_frag").toString
    TimePartitioned.writeDaily(events.repartition(32), s"$base/a")
    TimePartitioned.writeDaily(events.repartition(7), s"$base/b")
    def order(dir: String) = TimePartitioned.read(spark, dir)
      .select("dt", "event_id").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    val (a, b) = (order(s"$base/a"), order(s"$base/b"))
    assert(a.sorted == b.sorted, "same content")
    assert(a.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2) == rows.map(_._2).sorted },
      "each day's rows must come back key-sorted")
  }

  test("overwriteDays: re-running one day replaces only that day") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dt_idem").toString
    TimePartitioned.writeDaily(events, dir)
    val total = TimePartitioned.read(spark, dir).count()
    val day = TimePartitioned.read(spark, dir)
      .select(date_format(col("dt"), "yyyy-MM-dd")).orderBy("dt")
      .head().getString(0)
    // Re-ingest ONE day with a modified payload (value + 1).
    val oneDay = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .withColumn("value", col("value") + 1000000d)
    TimePartitioned.writeDaily(oneDay, dir, overwriteDays = true)
    val back = TimePartitioned.read(spark, dir)
    assert(back.count() == total, "other days must be untouched")
    assert(back.filter(col("dt") === day && col("value") < 1000000d)
      .count() == 0L, "the re-ingested day must carry the new payload")
    assert(back.filter(col("dt") =!= day && col("value") >= 1000000d)
      .count() == 0L, "no other day may carry the new payload")
  }
}
