package graft

import java.nio.file.{Files => JFiles}

import graft.model.{ValidationResult, ValidationSuiteResult}
import graft.sink.ResultStore

/** GE-style validation store + data-docs emitter. */
class ResultStoreSpec extends SparkSpec {

  private def suite(bad: Boolean): ValidationSuiteResult =
    ValidationSuiteResult.of(Seq(
      ValidationResult("t.row_count_between", "PASSED", "ok", elementCount = 10),
      ValidationResult("t.in_set:region", if (bad) "FAILED" else "PASSED",
        "region check", elementCount = 10,
        unexpectedCount = if (bad) 2 else 0,
        unexpectedPercent = if (bad) 20.0 else 0.0,
        partialUnexpectedList = if (bad) Seq("X", "Y") else Nil)))

  test("write/read round-trips runs with partition pruning by run_id") {
    val dir = JFiles.createTempDirectory("graft-store").toString + "/store"
    ResultStore.write(spark, suite(bad = true), dir, "run-1")
    ResultStore.write(spark, suite(bad = false), dir, "run-2")

    val all = ResultStore.read(spark, dir)
    assert(all.count() == 4)
    val r1 = ResultStore.read(spark, dir, Some("run-1"))
    assert(r1.count() == 2)
    val failed = r1.filter("status = 'FAILED'").head()
    assert(failed.getAs[Long]("unexpected_count") == 2L)
    assert(failed.getAs[scala.collection.Seq[String]]("partial_unexpected_list")
      .toSeq == Seq("X", "Y"))
    // run_id partition actually prunes: the read of run-1 only touches its dir
    val plan = r1.queryExecution.executedPlan.toString
    assert(plan.contains("run-1") || plan.contains("PartitionFilters"))
  }

  test("data docs render the summary table") {
    val md = ResultStore.renderDocs(suite(bad = true), "run-9")
    assert(md.contains("**Overall: FAILED** — 1/2 passed"))
    assert(md.contains("| t.in_set:region | FAILED | 10 | 2 | 20.00 |"))
  }

  test("writeDocs persists markdown + HTML pages and the site index per run") {
    val dir = JFiles.createTempDirectory("graft-docs").toString
    val p = ResultStore.writeDocs(suite(bad = false), dir, "run/..3")
    assert(p.getFileName.toString == "run_..3.html")
    assert(JFiles.readString(p).contains("PASSED"))
    val md = p.resolveSibling("run_..3.md")
    assert(JFiles.readString(md).contains("Overall: PASSED"))
    assert(JFiles.readString(p.resolveSibling("index.html"))
      .contains("""href="run_..3.html""""))
  }
}
