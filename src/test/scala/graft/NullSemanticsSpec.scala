package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SURVEY.md §7.4 risk 1 — the deliberate D4-vs-R1 null divergence:
  *
  *  - D4 (SQL `NOT IN`, pager-workflow.py:215): a NULL region is silently
  *    DROPPED by ternary logic — it can never violate the whitelist;
  *  - R1 (row rule, analysis.md:9 `record.get('region','')`): a missing
  *    region defaults to '' BEFORE the membership test, so it IS flagged
  *    whenever '' is not whitelisted.
  *
  * Both behaviors are intended; these tests pin them so neither
  * formulation silently drifts into the other. */
class NullSemanticsSpec extends SparkSpec {

  private val whitelist = Seq("Northwest", "Southwest")
  private val data = df(Seq(
    Row("Northwest"), Row(null), Row("Atlantis")), "region STRING")

  test("D4 NOT-IN formulation drops the NULL row") {
    val violations = data
      .filter(!col("region").isin(whitelist: _*))
      .select("region").collect().map(_.getString(0))
    assert(violations.toSeq == Seq("Atlantis")) // null NOT flagged
  }

  test("R1 ''-default formulation flags the NULL row as ''") {
    val violations = data
      .select(coalesce(col("region"), lit("")).as("region"))
      .filter(!col("region").isin(whitelist: _*))
      .select("region").collect().map(_.getString(0)).sorted
    assert(violations.toSeq == Seq("", "Atlantis"))
  }

  test("the two formulations agree when no nulls are present") {
    val clean = data.filter("region IS NOT NULL")
    val d4 = clean.filter(!col("region").isin(whitelist: _*)).count()
    val r1 = clean.select(coalesce(col("region"), lit("")).as("region"))
      .filter(!col("region").isin(whitelist: _*)).count()
    assert(d4 == r1)
  }
}
