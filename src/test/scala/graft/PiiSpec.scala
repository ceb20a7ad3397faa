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

  test("card scan: Luhn gates redaction — valid PANs redact, invalid " +
       "candidates survive byte-for-byte, separators handled") {
    import graft.functions.CardScan.luhnValid
    // Known PANs: the classic test numbers are Luhn-valid; a one-digit
    // tamper breaks the checksum.
    assert(luhnValid("4111111111111111"))
    assert(luhnValid("4539 5787 6362 1486"))
    assert(luhnValid("378282246310005")) // 15-digit Amex
    assert(!luhnValid("4111111111111112"))
    assert(!luhnValid("1234567890123"))
    val rows = df(Seq(
      Row(1L, "pay 4111111111111111 now"),
      Row(2L, "grouped 4539-5787-6362-1486 ok"),
      Row(3L, "order 4111111111111112 is not a card"),
      Row(4L, "tracking 12345678901234567890 too long"), // 20 digits: no \b match
      Row(5L, "mixed 4539 5787-6362 1486 separators"),   // inconsistent: not a card
      Row(6L, null),
      Row(7L, "no digits at all")),
      "doc_id BIGINT, text STRING")
    val out = Pii.redactCards(rows).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    assert(out(1L) == ("pay <CARD> now", 1, 1))
    assert(out(2L) == ("grouped <CARD> ok", 1, 1))
    assert(out(3L) == ("order 4111111111111112 is not a card", 1, 0),
      "an invalid candidate must survive untouched")
    assert(out(4L)._2 == 0, "a 20-digit run is not a 19-digit card")
    assert(out(5L)._2 == 0, "mixed separators are not a card")
    assert(out(6L) == ((null, -1, -1)))
    assert(out(7L) == (("no digits at all", 0, 0)))
  }

  test("registered x7_card_scan: every 17th doc redacts two cards, " +
       "every 19th keeps its two invalid candidates") {
    val rows = Queries.x7CardScan(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    val valid17 = docs.filter(col("doc_id") % 17 === 0 &&
      col("text").isNotNull).count()
    val invalid19 = docs.filter(col("doc_id") % 17 =!= 0 &&
      col("doc_id") % 19 === 0 && col("text").isNotNull).count()
    assert(rows.map(_.getAs[Long]("docs_with_card")).sum == valid17)
    assert(rows.map(_.getAs[Long]("n_valid")).sum == 2 * valid17)
    assert(rows.map(_.getAs[Long]("n_candidates")).sum ==
      2 * valid17 + 2 * invalid19)
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
