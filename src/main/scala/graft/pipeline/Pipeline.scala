package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.checks._
import graft.etl.Stages
import graft.model._
import graft.suite.{TableChecks, ValidationGateException, ValidationSuite}

/** E1 — the flagship batch validation pipeline, the reference's
  * `pager-workflow-1` DAG re-expressed as in-process stages
  * (pager-workflow.py:285-325):
  *
  *   validate_raw (hard gate) → transform (dbt models, natively) →
  *   validate_transformed (run-all suite) → report.
  *
  * Where the reference crosses four process boundaries (Airflow worker →
  * BigQuery → dbt Cloud → PagerDuty) and sleeps 120 s for dbt
  * (pager-workflow.py:309-313), the Spark-native pipeline is one lazy
  * Catalyst DAG per stage with synchronous actions — no polling, no sleep.
  */
object Pipeline {

  final case class Outcome(
      rawValidation: ValidationSuiteResult,
      transformedValidation: ValidationSuiteResult,
      outputs: Map[String, DataFrame],
      report: Option[FailureReport]) {
    def passed: Boolean = transformedValidation.passed
  }

  /** Pre-transform gate (V1, pager-workflow.py:117-143): D1 count > 0 and
    * D2 null-key == 0 on the raw dims; raises on failure. */
  def validateRaw(spark: SparkSession, sfDir: String): ValidationSuiteResult =
    ValidationSuite.runGate(Seq(
      TableChecks("raw_region", Tables.region(spark, sfDir),
        Seq(RowCountCheck(), NotNullCheck("r_regionkey"))),
      TableChecks("raw_nation", Tables.nation(spark, sfDir),
        Seq(RowCountCheck(), NotNullCheck("n_nationkey"))),
      TableChecks("raw_salesperson", Tables.supplier(spark, sfDir),
        Seq(RowCountCheck(), NotNullCheck("s_suppkey")))))

  /** The dbt-equivalent transform layer (T1–T3). */
  def transform(spark: SparkSession, sfDir: String): Map[String, DataFrame] = Map(
    "stg_territory" -> Stages.stgTerritory(
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir)),
    "stg_salesperson" -> Stages.stgSalesperson(Tables.supplier(spark, sfDir)),
    "mart_sales_performance" -> Stages.martSalesPerformance(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir)))

  /** Post-transform suite (V2, pager-workflow.py:145-233): non-empty counts
    * on all three models + the region whitelist test on stg_territory.
    * Run-all, per-check error capture. */
  def validateTransformed(
      outputs: Map[String, DataFrame], whitelist: Seq[String]): ValidationSuiteResult =
    ValidationSuite.run(Seq(
      TableChecks("stg_territory", outputs("stg_territory"),
        Seq(RowCountCheck(), InSetCheck("region_name", whitelist))),
      TableChecks("stg_salesperson", outputs("stg_salesperson"),
        Seq(RowCountCheck(), NotNullCheck("salesperson_key"))),
      TableChecks("mart_sales_performance", outputs("mart_sales_performance"),
        Seq(RowCountCheck()))))

  /** Full E1 run. `whitelist` defaults to the deliberately-incomplete
    * flagship list (NATION_20..24 excluded — test-pager-action.py:186), so
    * a default run exercises the failure path end-to-end like the
    * reference's fault-injection DAG. */
  def run(
      spark: SparkSession, sfDir: String,
      whitelist: Seq[String] = graft.Queries.regionWhitelist,
      runId: String = "local-run",
      timestamp: String = "1970-01-01T00:00:00Z"): Outcome = {
    val raw = validateRaw(spark, sfDir) // throws ValidationGateException on failure
    val outputs = transform(spark, sfDir)
    val transformed = validateTransformed(outputs, whitelist)
    val report =
      if (transformed.passed) None
      else Some(ValidationSuite.failureReport(
        pipeline = "pager-workflow-1", task = "validate_transformed_data",
        result = transformed, timestamp = timestamp, runId = runId))
    Outcome(raw, transformed, outputs, report)
  }

  /** E1 with the V4 fan-out attached: on failure the report goes to the
    * notifier before the outcome returns (reference: alert fires, THEN the
    * task raises — pager-workflow.py:250-267). */
  def runAndNotify(
      spark: SparkSession, sfDir: String,
      notifier: graft.sink.Notifier,
      whitelist: Seq[String] = graft.Queries.regionWhitelist,
      runId: String = "local-run",
      timestamp: String = "1970-01-01T00:00:00Z"): Outcome = {
    val outcome = run(spark, sfDir, whitelist, runId, timestamp)
    outcome.report.foreach(notifier.notify)
    outcome
  }
}
