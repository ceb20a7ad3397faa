package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X7 — PII detection and redaction for training-data hygiene: emails,
  * phone numbers, and IPv4 addresses surfaced per document and scrubbed
  * before a corpus ships to training.
  *
  * Patterns are deliberately RE2-compatible AND Java-regex-compatible
  * (no lookarounds, no backreferences) so the DuckDB oracle replays the
  * same matches — and so the scan stays linear-time on adversarial
  * inputs (catastrophic backtracking is a real denial-of-service vector
  * when scanning 100 TB of crawled text; RE2-safe patterns cannot
  * backtrack).
  *
  * Everything is a per-row expression: one narrow scan, no shuffle
  * before the summary aggregate.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val kinds: Seq[(String, String)] =
    Seq("email" -> emailRe, "phone" -> phoneRe, "ipv4" -> ipv4Re)

  private def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Per-row match counts: adds `n_email`, `n_phone`, `n_ipv4`. */
  def matchCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    kinds.foldLeft(df) { case (acc, (kind, re)) =>
      acc.withColumn(s"n_$kind", countMatches(col(textCol), re))
    }

  /** Per-group scan summary: documents scanned, documents containing any
    * PII, and total matches per kind — ONE fused aggregate. */
  def scanSummary(df: DataFrame, textCol: String = "text",
                  groupCol: String = "source"): DataFrame = {
    val counted = matchCounts(df, textCol)
    val anyPii = kinds.map { case (k, _) => col(s"n_$k") > 0 }
      .reduce(_ || _)
    counted.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_docs"),
        count(when(anyPii, lit(1))).as("docs_with_pii"),
        sum(col("n_email")).as("n_email"),
        sum(col("n_phone")).as("n_phone"),
        sum(col("n_ipv4")).as("n_ipv4"))
      .orderBy(groupCol)
  }

  /** Replace every match with `<KIND>` placeholders. Order is fixed
    * (email, phone, ipv4) so overlapping candidates resolve
    * deterministically. */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn(textCol,
      kinds.foldLeft(col(textCol)) { case (c, (kind, re)) =>
        regexp_replace(c, re, s"<${kind.toUpperCase}>")
      })

  /** X7b — CHECKSUM-VALIDATED payment-card scan + conditional
    * redaction ([[graft.functions.CardScan]], one native traversal per
    * row): a 13–19-digit run is only a CANDIDATE — order numbers and
    * tracking ids match the same shape — so redaction is gated on the
    * ISO-7812 Luhn check, which a regex cannot express and
    * `regexp_replace` cannot apply per match. Regex-only redaction
    * OVER-redacts (corrupting exactly the ids a training corpus should
    * keep); this replaces only Luhn-valid matches with `<CARD>` and
    * counts both populations for the audit. Adds `n_card_candidates`,
    * `n_card_valid`, and rewrites `textCol`. Map-only, no shuffle. */
  def redactCards(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__cs", graft.functions.TextFunctions.cardScan(col(textCol)))
      .withColumn("n_card_candidates", col("__cs.n_candidates"))
      .withColumn("n_card_valid", col("__cs.n_valid"))
      .withColumn(textCol, col("__cs.redacted"))
      .drop("__cs")
}
