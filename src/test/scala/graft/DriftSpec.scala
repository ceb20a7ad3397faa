package graft

import org.apache.spark.sql.functions._

import graft.checks.{EvaluationParameters, RowCountCheck, RowCountDriftCheck}
import graft.model.ValidationStatus
import graft.sink.ResultStore
import graft.suite.{TableChecks, ValidationSuite}

/** Cross-run drift checks (EvaluationParameterStore analog): the store
  * round-trip over a two-run history, latest-run selection, and the
  * pass/fail threshold semantics. */
class DriftSpec extends SparkSpec {

  private def store: String =
    java.nio.file.Files.createTempDirectory("graft_drift_spec").toString

  private def runOf(df: org.apache.spark.sql.DataFrame) =
    ValidationSuite.run(Seq(TableChecks("orders", df, Seq(RowCountCheck()))))

  test("lastRunElementCount picks the lexically-latest run of a two-run store") {
    val dir = store
    val orders = Tables.orders(spark, sfDir)
    // Run 1: full table. Run 2 (later): table minus keys ≡ 0 mod 10.
    ResultStore.write(spark, runOf(orders), dir, "2026-01-01T00:00:00Z")
    ResultStore.write(spark, runOf(orders.filter(col("o_orderkey") % 10 =!= 0)),
      dir, "2026-01-02T00:00:00Z")
    val Some((runId, count)) = EvaluationParameters
      .lastRunElementCount(spark, dir, "orders.row_count_between")
    assert(runId == "2026-01-02T00:00:00Z")
    assert(count == orders.filter(col("o_orderkey") % 10 =!= 0).count())
    assert(count < orders.count())
  }

  test("lastRunElementCount is None for a name the store never recorded") {
    val dir = store
    ResultStore.write(spark, runOf(Tables.orders(spark, sfDir)), dir, "r1")
    assert(EvaluationParameters
      .lastRunElementCount(spark, dir, "orders.no_such_check").isEmpty)
  }

  test("RowCountDriftCheck passes within the threshold and fails outside it") {
    val orders = Tables.orders(spark, sfDir)
    val n = orders.count()
    val baseline = orders.filter(col("o_orderkey") % 10 =!= 0).count()
    val drift = math.abs(n - baseline).toDouble / baseline * 100.0
    assert(drift > 5.0 && drift < 15.0, s"fixture drift $drift% out of band")

    val loose = RowCountDriftCheck("r1", baseline, 15.0).run(orders)
    assert(loose.status == ValidationStatus.Passed)
    assert(math.abs(loose.unexpectedPercent - drift) < 1e-9)

    val tight = RowCountDriftCheck("r1", baseline, 5.0).run(orders)
    assert(tight.status == ValidationStatus.Failed)
    assert(tight.unexpectedCount == 1L)
    assert(tight.message.contains("r1"))
  }

  test("a zero-row baseline is rejected at construction") {
    intercept[IllegalArgumentException](RowCountDriftCheck("r1", 0L, 10.0))
  }

  test("the registered v5_drift_check query flags only the tight threshold") {
    val rows = Queries.v5DriftCheck(spark, sfDir).collect()
    assert(rows.length == 2)
    val byName = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("orders.row_count_drift:15.0pct") == "PASSED")
    assert(byName("orders.row_count_drift:5.0pct") == "FAILED")
  }
}
