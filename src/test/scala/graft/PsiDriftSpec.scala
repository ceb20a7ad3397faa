package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.ext.PsiDrift

class PsiDriftSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String, Double)*) =
    df(rows.map { case (id, sec, et, v) =>
      Row(id, new Timestamp(sec * 1000L), 1L, et, v, "{}")
    }, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  private val W = 604800L

  test("baseline week scores PSI exactly 0; identical week ~0; shifted week > 0") {
    val base = (1L to 40L).map(i => (i, i, "t", (i % 4) * 25.0 + 1.0))
    val same = (1L to 40L).map(i => (100 + i, W + i, "t", (i % 4) * 25.0 + 1.0))
    val shifted = (1L to 40L).map(i => (200 + i, 2 * W + i, "t", 300.0 + i))
    val out = PsiDrift.psiByWeek(ev(base ++ same ++ shifted: _*))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("psi_micro")).toMap
    val weeks = out.keys.toSeq.sorted
    assert(out(weeks(0)) == 0L, "baseline vs itself must be exactly 0")
    assert(out(weeks(1)) == 0L, "identical distribution must score 0")
    assert(out(weeks(2)) > 250000L, // > 0.25 — the 'shifted' convention
      s"disjoint distribution scored only ${out(weeks(2))} micro-PSI")
  }

  test("per-type independence: only the drifted type flags") {
    val stableA = Seq((1L, 1L, "a", 10.0), (2L, W + 1, "a", 10.0))
    val drifterB = Seq((3L, 2L, "b", 10.0), (4L, W + 2, "b", 450.0))
    val out = PsiDrift.psiByWeek(ev(stableA ++ drifterB: _*))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getAs[Long]("psi_micro"))
      .toMap
    val w1 = out.keys.map(_._1).min + 1
    assert(out((w1, "a")) == 0L && out((w1, "b")) > 0L)
  }

  test("partitioning-invariant and every count accounted") {
    val e = Tables.events(spark, sfDir)
    val a = PsiDrift.psiByWeek(e).collect()
    val b = PsiDrift.psiByWeek(e.repartition(11)).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getAs[Long]("n_events")).sum == e.count())
  }

  test("bad bin width rejected") {
    intercept[IllegalArgumentException] {
      PsiDrift.psiByWeek(ev((1L, 1L, "t", 1.0)), binWidth = 0.0)
    }
  }
}
