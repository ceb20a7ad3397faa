package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.EmbedDrift

class EmbedDriftSpec extends SparkSpec {

  private val ddl = "vec_id BIGINT, embedding ARRAY<DOUBLE>, label BIGINT"

  test("small fixture: exact truncated micro-means and squared-diff " +
       "numerator; identical snapshots drift zero") {
    // label 1 prev: [1, 0] and [0, 1] → q = [127, 0], [0, 127] →
    // sums (127, 127), n = 2 → m = 63500000 each. cur: [1, 0] only →
    // m = (127000000, 0). drift = 0² pairing? (63.5e6 − 127e6)² +
    // (63.5e6 − 0)² = 2 · 63500000².
    val prev = df(Seq(
      Row(1L, Seq(1.0, 0.0), 1L), Row(2L, Seq(0.0, 1.0), 1L),
      Row(3L, Seq(0.5, 0.5), 2L)), ddl)
    val cur = df(Seq(
      Row(11L, Seq(1.0, 0.0), 1L),
      Row(13L, Seq(0.5, 0.5), 2L),
      Row(14L, Seq(0.25, 0.75), 3L)), ddl)
    val out = EmbedDrift.centroidDrift(prev, cur).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDecimal(3).toBigInteger.longValueExact())).toMap
    val d = 63500000L
    assert(out(1L) == ((2L, 1L, 2L * d * d)), s"got ${out(1L)}")
    // label 2 identical both sides → exact zero drift.
    assert(out(2L) == ((1L, 1L, 0L)))
    // label 3 only in cur → no defined drift, dropped.
    assert(!out.contains(3L))
  }

  test("registered plant: the shifted label's drift dominates every " +
       "unshifted label's") {
    // The corpus label column is int32 — read it width-agnostically.
    // drift_num ships as a canonical integer string at the registered
    // boundary (the r12 hash-stability discipline).
    val rows = Queries.x43EmbedDrift(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue ->
        BigDecimal(r.getString(3))).toMap
    val shifted = rows(3L)
    // At sf0.001 the halves hold only ~25 vectors per label, so the
    // background (sampling) drift is large — pin strict dominance, not
    // a ratio (at sf0.01 the ratio is ~13×).
    rows.filterNot(_._1 == 3L).foreach { case (l, v) =>
      assert(shifted > v,
        s"planted label 3 ($shifted) must dominate label $l ($v)")
    }
  }

  test("drift is partitioning-invariant") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = EmbedDrift.centroidDrift(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1)).collect().map(_.toSeq).toSet
    val b = EmbedDrift.centroidDrift(
      emb.filter(col("vec_id") % 2 === 0).repartition(7),
      emb.filter(col("vec_id") % 2 === 1).repartition(3))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
