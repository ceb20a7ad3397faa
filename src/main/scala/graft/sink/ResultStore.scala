package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ValidationSuiteResult

/** Validation result store + data-docs emitter — the engine's counterpart
  * of the GE project config the reference checks in
  * (great_expectations/great_expectations.yml:12-16 ValidationsStore,
  * :25-30 data-docs SiteBuilder): suite results persist as partitioned
  * parquet (queryable like any table) and render as a human-readable
  * summary page.
  */
object ResultStore {

  /** A suite result as a DataFrame (one row per check), stamped with the
    * run id so successive runs append into a queryable history. */
  def toDF(spark: SparkSession, suite: ValidationSuiteResult,
           runId: String): DataFrame = {
    import spark.implicits._
    suite.details
      .map(r => (runId, r.validationName, r.status, r.message,
        r.elementCount, r.unexpectedCount, r.unexpectedPercent,
        r.partialUnexpectedList))
      .toDF("run_id", "validation_name", "status", "message",
        "element_count", "unexpected_count", "unexpected_percent",
        "partial_unexpected_list")
  }

  /** Append the suite result into the store, partitioned by run —
    * partition pruning makes per-run reads O(run), not O(history). */
  def write(spark: SparkSession, suite: ValidationSuiteResult,
            dir: String, runId: String): Unit =
    toDF(spark, suite, runId)
      .write.mode(SaveMode.Append).partitionBy("run_id").parquet(dir)

  /** Read the store back (all runs, or one). */
  def read(spark: SparkSession, dir: String, runId: Option[String] = None): DataFrame = {
    val all = spark.read.parquet(dir)
    runId.fold(all)(id => all.filter(col("run_id") === id))
  }

  /** Data-docs-style markdown summary of one suite run. */
  def renderDocs(suite: ValidationSuiteResult, runId: String): String = {
    val header =
      s"""# Validation run `$runId`
         |
         |**Overall: ${suite.overallStatus}** — ${suite.passedCount}/${suite.totalCount} passed
         |
         || check | status | elements | unexpected | % | detail |
         ||---|---|---|---|---|---|
         |""".stripMargin
    val rows = suite.details.map { r =>
      val pct = f"${r.unexpectedPercent}%.2f"
      s"| ${r.validationName} | ${r.status} | ${r.elementCount} " +
        s"| ${r.unexpectedCount} | $pct | ${r.message.replace("|", "\\|")} |"
    }
    header + rows.mkString("\n") + "\n"
  }

  /** Write `<runId>.md` under `dir` (created if absent); returns the path. */
  def writeDocs(suite: ValidationSuiteResult, dir: String, runId: String): java.nio.file.Path = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val safe = runId.replaceAll("[^A-Za-z0-9._-]", "_")
    Files.writeString(d.resolve(s"$safe.md"), renderDocs(suite, runId))
  }
}
