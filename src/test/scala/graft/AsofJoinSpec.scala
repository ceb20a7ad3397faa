package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def left(rows: (Long, Long, Long)*) = // (id, user, t)
    df(rows.map { case (id, u, t) => Row(id, u, sec(t)) },
      "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")

  private def right(rows: (Long, Long, Long, java.lang.Double)*) =
    df(rows.map { case (id, u, t, v) => Row(u, sec(t), id, v) },
      "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE")

  test("greatest at-or-before wins; earlier-than-all rows get nulls") {
    val l = left((1L, 7L, 50L), (2L, 7L, 100L), (3L, 7L, 250L))
    val r = right((10L, 7L, 100L, 1.0), (11L, 7L, 200L, 2.0))
    val out = AsofJoin.asofJoin(l, r, "user_id", "ts", "ts",
        Seq("event_id", "value"))
      .orderBy("event_id").collect()
    // t=50: before all -> nulls; t=100: simultaneous row included;
    // t=250: latest (t=200) wins over t=100.
    assert(out(0).isNullAt(3))
    assert(out(1).getAs[Long]("asof_event_id") == 10L)
    assert(out(2).getAs[Long]("asof_event_id") == 11L)
    assert(out(2).getAs[Double]("asof_value") == 2.0)
  }

  test("keys never cross; a chosen row's null field stays null") {
    val l = left((1L, 7L, 300L), (2L, 8L, 300L))
    // user 7's latest row carries a NULL value — the per-row struct
    // carry must NOT reach back to the older non-null 5.0.
    val r = right((10L, 7L, 100L, 5.0), (11L, 7L, 200L, null),
      (12L, 9L, 100L, 9.0))
    val out = AsofJoin.asofJoin(l, r, "user_id", "ts", "ts",
        Seq("event_id", "value"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("asof_event_id") == 11L)
    assert(out(0).isNullAt(4), "null field of the chosen row must survive")
    assert(out(1).isNullAt(3), "user 8 must not see user 9's rows")
  }

  test("NULL key/time rows pin LEFT-ASOF SQL semantics (ADVICE r8)") {
    // SQL ASOF (`l.key = r.key AND l.t >= r.t`) never matches NULLs,
    // but Window.partitionBy groups NULL keys and sorts NULL times
    // first — without the right-side filter, a null-key left row would
    // silently carry a null-key right row's values.
    val l = df(Seq(Row(1L, null, sec(300L)), Row(2L, 7L, null),
        Row(3L, 7L, sec(300L))),
      "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
    val r = df(Seq(Row(null, sec(100L), 10L, 1.0), Row(7L, null, 11L, 2.0),
        Row(7L, sec(100L), 12L, 3.0)),
      "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE")
    val out = AsofJoin.asofJoin(l, r, "user_id", "ts", "ts",
        Seq("event_id", "value"))
      .orderBy("event_id").collect()
    // Null-key left row: no match (never the null-key right row).
    assert(out(0).isNullAt(3), "null-key left row must carry nulls")
    // Null-time left row: no at-or-before row exists for it.
    assert(out(1).isNullAt(3), "null-time left row must carry nulls")
    // Normal row: matches the real (7, t=100) row — the null-time
    // right row (which sorts FIRST ascending) must have been dropped,
    // not carried.
    assert(out(2).getAs[Long]("asof_event_id") == 12L)
  }

  test("dedupRight keeps the max-tie row per (key, time)") {
    val r = right((10L, 7L, 100L, 1.0), (12L, 7L, 100L, 3.0),
      (11L, 7L, 200L, 2.0))
    val d = AsofJoin.dedupRight(r, "user_id", "ts", "event_id")
      .orderBy("ts").collect()
    assert(d.length == 2 && d(0).getAs[Long]("event_id") == 12L)
  }

  test("enrichAsOf: picks the valid version, NULLs history gaps, " +
       "expired tails, unknown keys, and pre-history facts") {
    // user 1: bronze [10, 20), silver [20, 30), gold [30, 40) — and
    // NOTHING past 40 (an expired tail, not an open row).
    // user 2: only bronze [10, 20) then a gap until gold [35, null).
    val dim = df(Seq(
      Row(1L, "bronze", sec(10), sec(20)),
      Row(1L, "silver", sec(20), sec(30)),
      Row(1L, "gold", sec(30), sec(40)),
      Row(2L, "bronze", sec(10), sec(20)),
      Row(2L, "gold", sec(35), null)),
      "user_id BIGINT, tier STRING, valid_from TIMESTAMP, valid_to TIMESTAMP")
    val facts = df(Seq(
      Row(1L, 1L, sec(20)),   // boundary: valid_from inclusive → silver
      Row(2L, 1L, sec(29)),   // silver
      Row(3L, 1L, sec(45)),   // past the last valid_to → expired, NULL
      Row(4L, 2L, sec(25)),   // in the gap → NULL
      Row(5L, 2L, sec(99)),   // open gold row
      Row(6L, 9L, sec(25)),   // unknown key → NULL
      Row(7L, 1L, sec(5))),   // before any version → NULL
      "event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
    val out = AsofJoin.enrichAsOf(facts, dim, "user_id", "ts",
        attrs = Seq("tier"))
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("dim_tier"))
    assert(out.toSeq == Seq(1L -> "silver", 2L -> "silver", 3L -> null,
      4L -> null, 5L -> "gold", 6L -> null, 7L -> null),
      s"got:\n${out.mkString("\n")}")
  }

  test("registered x21 is partitioning-invariant and matches a window replay") {
    val a = Queries.x21AsofJoin(spark, sfDir).collect()
    assert(a.length == Tables.events(spark, sfDir).count())
    // Independent formulation: per-user sort, running last purchase.
    val ev = Tables.events(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("__side"), col("event_id"))
      .rowsBetween(Long.MinValue, 0)
    val u = ev.select(col("event_id"), col("user_id"), col("ts"),
        lit(1).as("__side"), lit(null).cast("bigint").as("pid"),
        lit(null).cast("double").as("pv"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("__side"),
          col("event_id").as("pid"), col("value").as("pv")))
    val replay = u
      .withColumn("__r", last(when(col("__side") === 0,
        struct(col("pid"), col("pv"))), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("__r.pid").as("ref_event_id"), col("__r.pv").as("ref_value"))
      .orderBy("event_id").collect()
    assert(a.map(_.toSeq).toSeq == replay.toSeq.map(_.toSeq))
  }
}
