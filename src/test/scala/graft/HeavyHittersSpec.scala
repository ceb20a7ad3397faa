package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.HeavyHitters

class HeavyHittersSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("exact top terms equal a driver-side count over the same tokens; " +
       "ordering is (n DESC, term ASC); blank/null text contributes nothing") {
    val got = HeavyHitters.exactTopTerms(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = docs.select("text").collect()
      .flatMap(r => if (r.isNullAt(0)) Nil
        else r.getString(0).trim.split("\\s+").toSeq.filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(10)
    assert(got.toSeq == want, s"\n$got\nvs\n$want")
  }

  test("the exact path plans TakeOrderedAndProject — per-partition " +
       "top-k, never a global sort of the vocabulary") {
    val plan = HeavyHitters.exactTopTerms(docs, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("Misra-Gries guarantee: every term with count > n/(capacity+1) " +
       "survives, estimates under-count by at most n/(capacity+1)") {
    val exact = docs.select(explode(
        graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val capacity = 40
    val bound = n / (capacity + 1)
    val sketch = HeavyHitters.sketchTopTerms(docs, capacity).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= capacity)
    val mustSurvive = exact.filter(_._2 > bound)
    assert(mustSurvive.nonEmpty, "fixture must have heavy terms")
    mustSurvive.foreach { case (t, c) =>
      assert(sketch.contains(t), s"heavy term '$t' (count $c) lost")
      assert(sketch(t) <= c && sketch(t) >= c - bound,
        s"'$t': estimate ${sketch(t)} outside [${c - bound}, $c]")
    }
    // Every reported estimate is a valid under-count of SOME real term.
    sketch.foreach { case (t, est) =>
      assert(exact.getOrElse(t, 0L) >= est,
        s"'$t' over-counted: $est > ${exact.getOrElse(t, 0L)}")
    }
  }

  test("sketch is partitioning-invariant in its guarantee set") {
    val capacity = 40
    def heavySet(parts: Int): Set[String] = {
      val d = docs.repartition(parts)
      val exact = docs.select(explode(
          graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "").count()
      val bound = exact / (capacity + 1)
      HeavyHitters.sketchTopTerms(d, capacity).collect()
        .map(r => r.getString(0)).toSet
    }
    // The guarantee set (true heavy hitters) must be inside the result
    // at ANY partitioning; assert on the intersection stability of the
    // corpus's unambiguous heavies.
    val exact = docs.select(explode(
        graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val heavies = exact.filter(_._2 > n / 41).keySet
    Seq(1, 4, 16).foreach { p =>
      val s = heavySet(p)
      assert(heavies.subsetOf(s),
        s"at $p partitions, lost heavies: ${heavies -- s}")
    }
  }
}
