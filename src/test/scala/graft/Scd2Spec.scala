package graft

import graft.etl.Scd2
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{lit, to_date}
import java.sql.Date

/** T4 SCD-2 snapshot merge: every branch of the dbt check-strategy
  * contract, including the null-safe change test. */
class Scd2Spec extends SparkSpec {

  private val d0 = Date.valueOf("2025-06-01")
  private val d1 = Date.valueOf("2026-01-01")
  private val d2 = Date.valueOf("2026-02-01")

  private val histSchema =
    "k BIGINT, seg STRING, bal DOUBLE, valid_from DATE, valid_to DATE, is_current BOOLEAN"

  private def run(hist: Seq[Row], upd: Seq[Row]) =
    Scd2.snapshot(
      df(hist, histSchema),
      df(upd, "k BIGINT, seg STRING, bal DOUBLE"),
      keys = Seq("k"), tracked = Seq("seg", "bal"),
      ts = to_date(lit("2026-02-01")))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2),
        r.getDate(3), r.get(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._4.toString)).toSeq

  test("snapshot: change closes + inserts; unchanged/absent stay open; new inserts") {
    val hist = Seq(
      Row(1L, "A", 10.0, d0, d1, false), // closed prior version of 1
      Row(1L, "A", 20.0, d1, null, true), // open, CHANGED in snapshot
      Row(2L, "B", 30.0, d1, null, true), // open, unchanged in snapshot
      Row(3L, "C", 40.0, d1, null, true)) // open, ABSENT from snapshot
    val upd = Seq(
      Row(1L, "A", 25.0), // changed bal
      Row(2L, "B", 30.0), // identical
      Row(9L, "Z", 99.0)) // brand-new key
    assert(run(hist, upd) == Seq(
      (1L, "A", 10.0, d0, d1, false),   // closed row untouched
      (1L, "A", 20.0, d1, d2, false),   // open row closed at ts
      (1L, "A", 25.0, d2, null, true),  // new version inserted
      (2L, "B", 30.0, d1, null, true),  // unchanged stays open
      (3L, "C", 40.0, d1, null, true),  // hard delete ignored
      (9L, "Z", 99.0, d2, null, true))) // new key inserts open
  }

  test("snapshot chains: successive snapshots build the full version history") {
    val d2b = Date.valueOf("2026-03-01")
    val upd = (bal: Double) => df(Seq(Row(1L, "A", bal)),
      "k BIGINT, seg STRING, bal DOUBLE")
    val h1 = Scd2.snapshot(
      df(Seq(Row(1L, "A", 10.0, d0, null, true)), histSchema),
      upd(20.0), Seq("k"), Seq("seg", "bal"), to_date(lit("2026-01-01")))
    val h2 = Scd2.snapshot(h1, upd(30.0),
      Seq("k"), Seq("seg", "bal"), to_date(lit("2026-03-01")))
    val rows = h2.collect().map(r => (r.getLong(0), r.get(2),
      r.getDate(3), r.get(4), r.getBoolean(5)))
      .sortBy(_._3.toString).toSeq
    assert(rows == Seq(
      (1L, 10.0, d0, d1, false),
      (1L, 20.0, d1, d2b, false),
      (1L, 30.0, d2b, null, true)))
  }

  test("snapshot is idempotent: re-applying the same update snapshot is a no-op") {
    val hist = Seq(
      Row(1L, "A", 10.0, d0, d1, false),
      Row(1L, "A", 20.0, d1, null, true),
      Row(2L, "B", 30.0, d1, null, true),
      Row(3L, "C", 40.0, d1, null, true))
    val upd = Seq(Row(1L, "A", 25.0), Row(2L, "B", 30.0), Row(9L, "Z", 99.0))
    val updDf = df(upd, "k BIGINT, seg STRING, bal DOUBLE")
    val once = Scd2.snapshot(df(hist, histSchema), updDf,
      Seq("k"), Seq("seg", "bal"), to_date(lit("2026-02-01")))
    val twice = Scd2.snapshot(once, updDf,
      Seq("k"), Seq("seg", "bal"), to_date(lit("2026-03-01")))
    val key = (r: Row) => (r.getLong(0), String.valueOf(r.get(1)),
      String.valueOf(r.get(2)), r.getDate(3).toString,
      String.valueOf(r.get(4)), r.getBoolean(5))
    assert(twice.collect().map(key).sorted.toSeq ==
      once.collect().map(key).sorted.toSeq)
  }

  test("snapshot: null tracked values compare null-safely") {
    val hist = Seq(
      Row(1L, null, null, d1, null, true),  // null seg+bal, snapshot same -> no change
      Row(2L, "B", null, d1, null, true))   // null bal, snapshot fills it -> change
    val upd = Seq(Row(1L, null, null), Row(2L, "B", 5.0))
    assert(run(hist, upd) == Seq(
      (1L, null, null, d1, null, true),
      (2L, "B", null, d1, d2, false),
      (2L, "B", 5.0, d2, null, true)))
  }

  test("snapshot rejects empty key/tracked lists loudly (ADVICE r10)") {
    import org.apache.spark.sql.functions.{lit, to_date}
    val hist = df(Seq(Row(1L, "A", 1.0, d1, null, true)),
      "k BIGINT, seg STRING, bal DOUBLE, valid_from DATE, valid_to DATE, " +
        "is_current BOOLEAN")
    val upd = df(Seq(Row(1L, "A", 1.0)), "k BIGINT, seg STRING, bal DOUBLE")
    val ts = to_date(lit("2026-02-01"))
    // Pre-fix, empty tracked threw an opaque UnsupportedOperationException
    // from reduce on empty Seq; empty keys built a degenerate join.
    assertThrows[IllegalArgumentException](
      Scd2.snapshot(hist, upd, Seq("k"), Seq.empty, ts))
    assertThrows[IllegalArgumentException](
      Scd2.snapshot(hist, upd, Seq.empty, Seq("seg", "bal"), ts))
  }
}
