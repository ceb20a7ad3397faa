package graft.model

/** Result model of the validation engine.
  *
  * Mirrors the reference's result dicts — `validation_name`, `status`
  * ('PASSED'|'FAILED'), `message`/`error_message`, rule payloads
  * (reference: analysis.md:9, `DataValidationPipeline` result dicts) —
  * extended with the Great Expectations result shape the platform
  * declares as a dependency (`element_count`, `unexpected_count`,
  * `unexpected_percent`, `partial_unexpected_list`; reference:
  * airflow/requirements.txt:3, great_expectations/great_expectations.yml).
  */
final case class ValidationResult(
    validationName: String,
    status: String, // "PASSED" | "FAILED" | "ERROR"
    message: String,
    errorMessage: Option[String] = None,
    elementCount: Long = 0L,
    unexpectedCount: Long = 0L,
    unexpectedPercent: Double = 0.0,
    partialUnexpectedList: Seq[String] = Nil) {
  def passed: Boolean = status == ValidationStatus.Passed
}

object ValidationStatus {
  val Passed = "PASSED"
  val Failed = "FAILED"
  val Error  = "ERROR" // infra error captured per-check (reference: pager-workflow.py:158-169)
}

/** Suite summary — the reference's `run_all_validations` return shape
  * (analysis.md:9: overall_status, passed_count, failed_count,
  * total_count, failed_validations, details). */
final case class ValidationSuiteResult(
    overallStatus: String,
    passedCount: Long,
    failedCount: Long,
    totalCount: Long,
    failedValidations: Seq[String],
    details: Seq[ValidationResult]) {
  def passed: Boolean = overallStatus == ValidationStatus.Passed
}

object ValidationSuiteResult {
  /** Run-all (no short-circuit) fold — reference analysis.md:9. */
  def of(results: Seq[ValidationResult]): ValidationSuiteResult = {
    val failed = results.filterNot(_.passed)
    ValidationSuiteResult(
      overallStatus = if (failed.isEmpty) ValidationStatus.Passed else ValidationStatus.Failed,
      passedCount = results.count(_.passed),
      failedCount = failed.size,
      totalCount = results.size,
      failedValidations = failed.map(r => s"${r.validationName}: ${r.message}"),
      details = results)
  }
}

/** Failure envelope the reference ships to PagerDuty/agent on validation
  * failure (reference: pager-workflow.py:252-259 — pipeline, task, error,
  * failed_validations, timestamp, dag_run_id). Sink-agnostic here: the
  * engine returns it; notifier sinks serialize it (no network egress). */
final case class FailureReport(
    pipeline: String,
    task: String,
    error: String,
    failedValidations: Seq[String],
    timestamp: String,
    runId: String)
