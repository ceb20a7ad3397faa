package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.EventFunnel

class EventFunnelSpec extends SparkSpec {

  private val ddl = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
    "event_type STRING"

  private def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 $h%02d:$m%02d:00")

  test("strictly-after semantics: earliest-after-previous converts, " +
       "same-instant and out-of-order steps do not") {
    val rows = Seq(
      // user 1 converts all three (click after first view, purchase after)
      Row(1L, t(9, 0), 1L, "view"), Row(2L, t(9, 30), 1L, "click"),
      Row(3L, t(10, 0), 1L, "purchase"),
      // user 2: click BEFORE the view — no step-2 conversion
      Row(4L, t(8, 0), 2L, "click"), Row(5L, t(9, 0), 2L, "view"),
      // user 3: click at the SAME instant as the view — strict > fails
      Row(6L, t(9, 0), 3L, "view"), Row(7L, t(9, 0), 3L, "click"),
      // user 4: view then click, no purchase
      Row(8L, t(9, 0), 4L, "view"), Row(9L, t(9, 5), 4L, "click"),
      // user 5: purchase only — not even step 1
      Row(10L, t(9, 0), 5L, "purchase"))
    val out = EventFunnel.funnel(df(rows, ddl),
        Seq("view", "click", "purchase")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "view", 4L, 1000000L),
      (2L, "click", 2L, 500000L),
      (3L, "purchase", 1L, 250000L)),
      s"got:\n${out.mkString("\n")}")
  }

  test("earliest-first greedy: a later step-1 event must not steal the " +
       "conversion window") {
    // view@9, view@11, click@10: the FIRST view anchors, so the click
    // converts (a latest-view reading would reject it).
    val rows = Seq(
      Row(1L, t(9, 0), 1L, "view"), Row(2L, t(11, 0), 1L, "view"),
      Row(3L, t(10, 0), 1L, "click"))
    val out = EventFunnel.funnel(df(rows, ddl), Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("view", 1L), ("click", 1L)))
  }

  test("step validation: empty and duplicate step lists are rejected") {
    intercept[IllegalArgumentException] {
      EventFunnel.funnel(df(Seq.empty, ddl), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      EventFunnel.funnel(df(Seq.empty, ddl), Seq("view", "view"))
    }
  }
}
