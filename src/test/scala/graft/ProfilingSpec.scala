package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.checks.Profiling

class ProfilingSpec extends SparkSpec {

  private val ddl = "g STRING, x DOUBLE, y DOUBLE"

  test("small fixture: exact scaled sums and the hand-computed " +
       "Pearson; null pairs drop") {
    // g=a: (1,2), (2,4), (3,6) → perfect correlation, corr = 1.0.
    val rows = Seq(
      Row("a", 1.0, 2.0), Row("a", 2.0, 4.0), Row("a", 3.0, 6.0),
      Row("a", null, 9.0),
      Row("b", 1.0, 5.0), Row("b", 2.0, 3.0))
    val out = Profiling.corrStats(df(rows, ddl), "x", "y", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 3L)
    assert(a.getDecimal(2).longValueExact == 60000L)   // Σx·10⁴
    assert(a.getDecimal(3).longValueExact == 120000L)  // Σy·10⁴
    assert(a.getAs[Double]("corr6") == 1.0)
    // b: two points, negative slope → corr −1.
    assert(out("b").getAs[Double]("corr6") == -1.0)
  }

  test("the sums are mergeable: halves fold to the whole (the " +
       "incremental-profiling contract)") {
    val li = Tables.lineitem(spark, sfDir)
    def stats(d: org.apache.spark.sql.DataFrame) =
      Profiling.corrStats(d, "l_quantity", "l_extendedprice",
        "l_returnflag").collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("n"),
          BigDecimal(r.getDecimal(6)))).toMap  // sxy
    val whole = stats(li)
    val even = stats(li.filter(pmod(col("l_orderkey"), lit(2L)) === 0L))
    val odd = stats(li.filter(pmod(col("l_orderkey"), lit(2L)) === 1L))
    whole.foreach { case (flag, (n, sxy)) =>
      assert(n == even(flag)._1 + odd(flag)._1)
      assert(sxy == even(flag)._2 + odd(flag)._2,
        s"sxy must fold exactly for $flag")
    }
  }

  test("partitioning-invariant to the last displayed digit — the " +
       "property the built-in float corr does not promise") {
    val li = Tables.lineitem(spark, sfDir)
    val a = Profiling.corrStats(li, "l_quantity", "l_extendedprice",
      "l_returnflag").collect().map(_.toSeq)
    val b = Profiling.corrStats(li.repartition(23), "l_quantity",
      "l_extendedprice", "l_returnflag").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
