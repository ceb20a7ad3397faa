package graft

import org.apache.spark.sql.functions._

import graft.etl.Stages

class MartRollupSpec extends SparkSpec {

  private def mart() = {
    val s = spark; val d = sfDir
    (Stages.martSalesPerformance(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d), Tables.region(s, d)),
     Stages.martSalesRollup(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d), Tables.region(s, d)))
  }

  test("level-0 rollup rows equal the plain mart row-for-row") {
    val (plain, roll) = mart()
    val l0 = roll.filter(col("grouping_level") === 0L)
      .select("region_name", "nation_name", "line_count", "revenue",
        "avg_qty")
    val a = plain.collect().map(_.toSeq).toSet
    val b = l0.collect().map(_.toSeq).toSet
    assert(a == b, "ROLLUP's finest level must be the plain mart")
  }

  test("subtotal line counts fold upward exactly; exactly one grand " +
       "total; rolled keys carry the sentinel") {
    val (_, roll) = mart()
    val rows = roll.collect()
    val l0 = rows.filter(_.getAs[Long]("grouping_level") == 0L)
    val l1 = rows.filter(_.getAs[Long]("grouping_level") == 1L)
    val l3 = rows.filter(_.getAs[Long]("grouping_level") == 3L)
    assert(l3.length == 1, "exactly one grand-total row")
    assert(l3.head.getAs[String]("region_name") == "(all)" &&
      l3.head.getAs[String]("nation_name") == "(all)")
    assert(l1.forall(_.getAs[String]("nation_name") == "(all)"))
    // line_count is additive (revenue rounds per level, so only the
    // count folds exactly): each region subtotal = Σ of its nations,
    // grand total = Σ of regions.
    val byRegion = l0.groupBy(_.getAs[String]("region_name"))
      .view.mapValues(_.map(_.getAs[Long]("line_count")).sum).toMap
    l1.foreach { r =>
      val name = r.getAs[String]("region_name")
      assert(r.getAs[Long]("line_count") == byRegion(name),
        s"region $name subtotal drifted")
    }
    assert(l3.head.getAs[Long]("line_count") ==
      l1.map(_.getAs[Long]("line_count")).sum)
    // level 2 (nation without region) is not a ROLLUP level.
    assert(!rows.exists(_.getAs[Long]("grouping_level") == 2L))
  }
}
