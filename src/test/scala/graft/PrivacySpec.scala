package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Privacy

class PrivacySpec extends SparkSpec {

  private val ddl = "id BIGINT, zip STRING, age STRING, v BIGINT"

  test("group sizes are exact, suppression keeps exactly the >= k " +
       "groups, null quasi-values form a real group") {
    val rows = Seq(
      Row(1L, "94110", "30s", 10L), Row(2L, "94110", "30s", 20L),
      Row(3L, "94110", "30s", 30L),                      // group of 3
      Row(4L, "94110", "40s", 40L),                      // group of 1
      Row(5L, null, null, 50L), Row(6L, null, null, 60L) // null group of 2
    )
    val d = df(rows, ddl)
    val ann = Privacy.kAnonymity(d, Seq("zip", "age"), k = 2L)
      .select("id", "group_size", "is_kanon").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(ann.sameElements(Array(
      (1L, 3L, true), (2L, 3L, true), (3L, 3L, true),
      (4L, 1L, false), (5L, 2L, true), (6L, 2L, true))),
      s"got ${ann.mkString(", ")}")
    val kept = Privacy.suppress(d, Seq("zip", "age"), k = 2L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 2L, 3L, 5L, 6L)))
    // Original columns survive untouched; helper columns are gone.
    assert(Privacy.suppress(d, Seq("zip", "age"), 2L).columns.toSeq ==
      Seq("id", "zip", "age", "v"))
  }

  test("k = 1 releases everything; k above the largest group " +
       "suppresses everything; partitioning-invariant") {
    val d = df((1L to 90L).map(i => Row(i, s"z${i % 9}", "a", i)), ddl)
    assert(Privacy.suppress(d, Seq("zip"), 1L).count() == 90L)
    assert(Privacy.suppress(d, Seq("zip"), 11L).count() == 0L)
    val a = Privacy.kAnonymity(d.repartition(1), Seq("zip"), 10L)
      .select("id", "is_kanon").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    val b = Privacy.kAnonymity(d.repartition(13), Seq("zip"), 10L)
      .select("id", "is_kanon").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("registered x31_kanon: audit sums reconcile and suppression " +
       "bites somewhere") {
    val out = Queries.x31Kanon(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "kept cannot exceed total")
      assert(r.getLong(3) >= r.getLong(4), "suppressed groups <= groups")
    }
    // The plan is the census+join shape: no corpus-wide window.
    val plan = Queries.x31Kanon(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "k-anonymity must not plan a window")
  }

  test("lDiversity: homogeneous groups suppressed regardless of size, " +
       "null sensitive values never count, guards are loud") {
    import org.apache.spark.sql.functions._
    // Group a: 4 rows, all status X (k-anonymous at k=4, NOT 2-diverse).
    // Group b: 2 rows, statuses X/Y (2-diverse). Group null: X/null ->
    // diversity 1. Group c: nulls only -> diversity 0.
    val rows = Seq(
      Row(1L, "a", "X"), Row(2L, "a", "X"), Row(3L, "a", "X"),
      Row(4L, "a", "X"),
      Row(5L, "b", "X"), Row(6L, "b", "Y"),
      Row(7L, null, "X"), Row(8L, null, null),
      Row(9L, "c", null))
    val data = df(rows, "id BIGINT, q STRING, s STRING")
    val ann = graft.ext.Privacy.lDiversity(data, Seq("q"), "s", 2L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("group_size"), r.getAs[Long]("sensitive_diversity"),
          r.getAs[Boolean]("is_ldiverse"))).toMap
    assert(ann(1L) == ((4L, 1L, false)), "homogeneous big group must fail")
    assert(ann(5L) == ((2L, 2L, true)))
    assert(ann(7L) == ((2L, 1L, false)), "null quasi is a real group; " +
      "null sensitive does not add diversity")
    assert(ann(9L) == ((1L, 0L, false)), "all-null sensitive: diversity 0")
    val kept = graft.ext.Privacy.suppressNonDiverse(data, Seq("q"), "s", 2L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 6L))
    intercept[IllegalArgumentException] {
      graft.ext.Privacy.lDiversity(data, Seq("s"), "s", 2L)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Privacy.lDiversity(data, Seq("q"), "s", 0L)
    }
  }
}
