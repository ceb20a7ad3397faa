package graft

import graft.model.ValidationStatus
import graft.pipeline.Pipeline
import graft.suite.{TableChecks, ValidationGateException, ValidationSuite}
import graft.checks._
import org.apache.spark.sql.Row

/** E2E pipeline semantics, mirroring the reference's fault-injection DAG
  * (test-pager-action.py: a deliberately-incomplete whitelist exercises
  * the full failure path, and the envelope reads
  * "Validation failed: N out of M tests failed" — analysis.md:4). */
class PipelineSpec extends SparkSpec {

  test("default (fault-injection) whitelist produces the reference failure envelope") {
    val outcome = Pipeline.run(spark, sfDir)
    assert(!outcome.passed)
    val report = outcome.report.getOrElse(fail("expected a FailureReport"))
    // 5 post-transform checks, exactly one (the whitelist) fails.
    assert(report.error == "Validation failed: 1 out of 5 tests failed")
    assert(report.pipeline == "pager-workflow-1")
    assert(report.task == "validate_transformed_data")
    assert(report.failedValidations.exists(_.contains("in_set:region_name")))
    // The offending values are the deliberately-excluded NATION_20..24.
    assert(report.failedValidations.exists(m => m.contains("NATION_20") && m.contains("NATION_24")))
  }

  test("complete whitelist passes and yields no report") {
    val full = (0 to 24).map(i => s"NATION_$i")
    val outcome = Pipeline.run(spark, sfDir, whitelist = full)
    assert(outcome.passed)
    assert(outcome.report.isEmpty)
    assert(outcome.transformedValidation.failedCount == 0)
  }

  test("raw gate passes on testdata and reports 6 checks") {
    val raw = Pipeline.validateRaw(spark, sfDir)
    assert(raw.passed && raw.totalCount == 6)
  }

  test("runGate throws on failure and carries the suite result") {
    val bad = df(Seq(Row(1L), Row(null)), "k BIGINT")
    val ex = intercept[ValidationGateException] {
      ValidationSuite.runGate(Seq(TableChecks("t", bad, Seq(NotNullCheck("k")))))
    }
    assert(ex.result.failedCount == 1)
    assert(ex.getMessage.contains("1 out of 1"))
  }

  test("suite captures a poisoned check as ERROR without crashing the run") {
    val data = df(Seq(Row(1L)), "k BIGINT")
    val result = ValidationSuite.run(Seq(TableChecks("t", data,
      Seq(RowCountCheck(), NotNullCheck("no_such_column")))))
    assert(result.totalCount == 2)
    assert(result.details.exists(_.status == ValidationStatus.Error))
    assert(result.details.exists(_.passed)) // the healthy check still ran
  }

  test("run-all semantics: every check runs even when the first fails") {
    val data = df(Seq(Row(null, -1.0)), "k STRING, v DOUBLE")
    val result = ValidationSuite.run(Seq(TableChecks("t", data, Seq(
      NotNullCheck("k"), BetweenCheck("v", min = Some(0.0)), RowCountCheck()))))
    assert(result.totalCount == 3)
    assert(result.failedCount == 2)
    assert(result.passedCount == 1)
  }
}
