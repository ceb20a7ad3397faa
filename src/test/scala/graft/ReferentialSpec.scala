package graft

import org.apache.spark.sql.Row

import graft.checks.Referential

class ReferentialSpec extends SparkSpec {

  test("orphan census: counts orphans exactly, nulls are missing not " +
       "dangling, duplicate parent keys never fan out") {
    val child = df(Seq(Row(1L), Row(1L), Row(2L), Row(9L), Row(null)),
      "fk BIGINT")
    // parent key 1 appears twice — the census must still count child
    // rows once each (the key set deduplicates).
    val parent = df(Seq(Row(1L), Row(1L), Row(2L), Row(3L)), "pk BIGINT")
    val r = Referential.orphanCensus(child, "c", "fk", parent, "p", "pk")
      .collect().head
    assert(r.getAs[Long]("n_child") == 4L)
    assert(r.getAs[Long]("n_null_fk") == 1L)
    assert(r.getAs[Long]("n_orphans") == 1L)
    assert(!r.getAs[Boolean]("passed"))
  }

  test("a clean edge passes; the census unions edges in order") {
    val child = df(Seq(Row(1L), Row(2L)), "fk BIGINT")
    val parent = df(Seq(Row(1L), Row(2L)), "pk BIGINT")
    val out = Referential.census(Seq(
      (child, "a", "fk", parent, "p", "pk"),
      (child, "b", "fk", parent, "p", "pk"))).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Boolean]("passed")))
    assert(out.map(_.getAs[String]("child_table")).toSeq == Seq("a", "b"))
  }

  test("rowCountParity: equal counts pass, unequal fail, empty sides " +
       "count zero") {
    val a3 = df(Seq(Row(1L), Row(2L), Row(3L)), "x BIGINT")
    val b3 = df(Seq(Row(9L), Row(8L), Row(7L)), "x BIGINT")
    val b2 = df(Seq(Row(9L), Row(8L)), "x BIGINT")
    val empty = df(Seq.empty[Row], "x BIGINT")
    val ok = Referential.rowCountParity(a3, "a", b3, "b").collect().head
    assert(ok.getAs[Long]("n_a") == 3L && ok.getAs[Long]("n_b") == 3L)
    assert(ok.getAs[Boolean]("passed"))
    assert(ok.getAs[String]("table_a") == "a")
    val bad = Referential.rowCountParity(a3, "a", b2, "b").collect().head
    assert(bad.getAs[Long]("n_b") == 2L && !bad.getAs[Boolean]("passed"))
    val z = Referential.rowCountParity(empty, "e", empty, "e2")
      .collect().head
    assert(z.getAs[Long]("n_a") == 0L && z.getAs[Boolean]("passed"))
  }

  test("fdCensus: a second dependent value breaks the FD, null " +
       "dependents are missing not values, singletons hold") {
    val rows = df(Seq(
      Row("a", "x"), Row("a", "x"),          // holds (one value)
      Row("b", "x"), Row("b", "y"),          // violated
      Row("c", null), Row("c", "z"),         // holds — null is missing
      Row("d", null)),                       // holds — zero values
      "det STRING, dep STRING")
    val out = Referential.fdCensus(rows, "det", "dep").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_dep_values"),
        r.getAs[Boolean]("fd_holds"))).toMap
    assert(out("a") == ((1L, true)))
    assert(out("b") == ((2L, false)))
    assert(out("c") == ((1L, true)))
    assert(out("d") == ((0L, true)))
  }

  test("benford: first significant digit from the scaled rendering, " +
       "zero/negative excluded, ppm arithmetic exact") {
    val rows = df(Seq(
      Row(1.0), Row(0.19), Row(123.45), Row(900.0),
      Row(0.0), Row(-5.0)),
      "value DOUBLE")
    // scaled: 10000→'1', 1900→'1', 1234500→'1', 9000000→'9';
    // 0 and −5 drop → 4 rows, digits 1×3 and 9×1.
    val out = Referential.benford(rows, "value").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_obs"),
        r.getAs[Long]("obs_ppm"))).toMap
    assert(out == Map("1" -> ((3L, 750000L)), "9" -> ((1L, 250000L))),
      s"got $out")
    // The hardcoded expectation table is the real Benford law:
    // Σ ppm ≈ 10⁶ (rounding leaves exactly 10⁶ here).
    assert(Referential.BenfordPpm.values.sum == 1000000L)
  }

  test("the registered FD plant violates exactly one determinant") {
    val rows = Queries.g18FdCheck(spark, sfDir).collect()
    val broken = rows.filterNot(_.getAs[Boolean]("fd_holds"))
    assert(broken.length == 1 && broken.head.getAs[Long]("n_dep_values") == 2L)
  }

  test("the registered plant flags exactly the re-keyed lineitem edge " +
       "on clean testdata") {
    val rows = Queries.g17Referential(spark, sfDir).collect()
    val byEdge = rows.map(r => r.getAs[String]("child_table") ->
      r.getAs[Boolean]("passed")).toMap
    assert(!byEdge("lineitem"), "the plant must trip the orphan counter")
    assert(Seq("orders", "customer", "supplier", "nation")
      .forall(byEdge(_)), "clean edges must pass")
  }
}
