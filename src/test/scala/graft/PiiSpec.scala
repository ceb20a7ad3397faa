package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Pii

/** X7 PII detection/redaction: pattern coverage, counts, and the
  * scan-after-redact-is-clean invariant. */
class PiiSpec extends SparkSpec {

  private val fixtures = df(Seq(
    Row(1L, "mail me at jane.doe+spam@mail.example.org today", "a"),
    Row(2L, "call 555-123-4567 or 555.987.6543", "a"),
    Row(3L, "server at 192.168.1.250 is down", "b"),
    Row(4L, "no personal data here at all", "b"),
    Row(5L, "multi: x@y.io and 10.0.0.1 and 111-222-3333", "b")),
    "doc_id BIGINT, text STRING, source STRING")

  test("per-row counts find each PII kind") {
    val m = Pii.matchCounts(fixtures).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("n_email"),
        r.getAs[Int]("n_phone"), r.getAs[Int]("n_ipv4"))).toMap
    assert(m(1L) == ((1, 0, 0)))
    assert(m(2L) == ((0, 2, 0)))
    assert(m(3L) == ((0, 0, 1)))
    assert(m(4L) == ((0, 0, 0)))
    assert(m(5L) == ((1, 1, 1)))
  }

  test("scan summary aggregates per source") {
    val s = Pii.scanSummary(fixtures).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("docs_with_pii"))).toMap
    assert(s("a") == ((2L, 2L)))
    assert(s("b") == ((3L, 2L)))
  }

  test("redacted text scans clean and non-PII text is untouched") {
    val redacted = Pii.redact(fixtures)
    val rescan = Pii.scanSummary(redacted)
      .agg(sum(col("docs_with_pii"))).head().getLong(0)
    assert(rescan == 0L)
    assert(redacted.filter("doc_id = 4").head().getString(1) ==
      "no personal data here at all")
    assert(redacted.filter("doc_id = 5").head().getString(1) ==
      "multi: <EMAIL> and <IPV4> and <PHONE>")
  }

  test("registered x7_pii_scan finds exactly the planted contacts") {
    val rows = Queries.x7PiiScan(spark, sfDir).collect()
    val plantedDocs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 17 === 0).count()
    assert(rows.map(_.getAs[Long]("docs_with_pii")).sum == plantedDocs)
    assert(rows.map(_.getAs[Long]("n_email")).sum == plantedDocs)
    assert(rows.map(_.getAs[Long]("n_phone")).sum == plantedDocs)
    assert(rows.map(_.getAs[Long]("n_ipv4")).sum == plantedDocs)
  }
}
