package graft.checks

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ValidationResult, ValidationStatus}

/** Cross-run evaluation parameters — the engine's analog of the GE
  * EvaluationParameterStore the reference's project config declares
  * (/root/reference/great_expectations/great_expectations.yml:18-19):
  * expectations whose bounds reference a PRIOR run's recorded metrics,
  * read back from the [[graft.sink.ResultStore]] history.
  */
object EvaluationParameters {

  /** The most recent run's recorded `element_count` for one validation
    * name. Run ids must sort lexically by recency (ISO-8601 timestamps
    * do — the convention [[graft.pipeline.Pipeline]] stamps). One small
    * aggregated read of the store: `max_by` keeps it a single pass, and
    * the store's run_id partitioning keeps history reads prunable.
    * Returns (runId, elementCount); None when the store holds no row for
    * the name (first run — callers should then skip drift checks). */
  def lastRunElementCount(spark: SparkSession, storeDir: String,
                          validationName: String): Option[(String, Long)] = {
    // A missing/empty store is the first-run case, not an error.
    val store = scala.util.Try(graft.sink.ResultStore.read(spark, storeDir))
      .getOrElse(return None)
    val row = store
      .filter(col("validation_name") === validationName)
      .agg(max_by(struct(col("run_id"), col("element_count")), col("run_id"))
        .as("last"))
      .head()
    Option(row.getStruct(0)).map(s => (s.getString(0), s.getLong(1)))
  }
}

/** A declaratively-authored drift expectation before bind time: the
  * baseline metric lives in a ResultStore the suite FILE cannot name, so
  * the loader emits this placeholder and
  * [[graft.suite.SuiteLoader.bindWithHistory]] swaps it for a concrete
  * [[RowCountDriftCheck]] against the store's latest recorded run.
  * Running it unresolved throws — a drift check silently skipped is a
  * regression detector that never fires. */
final case class UnresolvedDriftCheck(maxPctChange: Double) extends Check {
  val name = s"row_count_drift:${maxPctChange}pct"
  def run(df: org.apache.spark.sql.DataFrame): ValidationResult =
    throw new IllegalStateException(
      s"$name is unresolved — bind the suite with SuiteLoader.bindWithHistory " +
        "so the baseline metric can be read from the result store")
}

/** `expect_row_count_within_pct_of_last_run` — the drift expectation the
  * GE config's EvaluationParameterStore exists for: today's row count
  * must sit within `maxPctChange` percent of the count the baseline run
  * recorded. `unexpectedPercent` carries the observed drift so the
  * result row is self-explaining.
  */
final case class RowCountDriftCheck(
    baselineRunId: String, baselineCount: Long, maxPctChange: Double)
  extends AggCheck {

  require(baselineCount > 0, "baseline run recorded no rows — drift undefined")
  val name = s"row_count_drift:${maxPctChange}pct"

  override def aggColumns(prefix: String): Seq[Column] =
    Seq(count(lit(1)).as(s"${prefix}element_count"))

  override def evaluate(row: Row, prefix: String): ValidationResult = {
    val n = row.getAs[Long](s"${prefix}element_count")
    val pct = math.abs(n - baselineCount).toDouble / baselineCount * 100.0
    val ok = pct <= maxPctChange
    // Locale.ROOT: the default-locale f interpolator prints comma
    // decimals on some machines, and this message lands verbatim in the
    // data-docs pages, which must render identically everywhere.
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    ValidationResult(name,
      if (ok) ValidationStatus.Passed else ValidationStatus.Failed,
      s"row count $n vs $baselineCount in run '$baselineRunId': " +
        s"drift ${num(pct, 2)}% (max ${num(maxPctChange, 1)}%)",
      elementCount = n,
      unexpectedCount = if (ok) 0L else 1L,
      unexpectedPercent = pct)
  }
}
