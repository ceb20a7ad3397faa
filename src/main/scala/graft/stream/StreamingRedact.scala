package graft.stream

import org.apache.spark.sql.DataFrame

import graft.ext.Pii

/** S11 — STREAMING compliance scrub: the X7 PII + payment-card
  * redaction as a serve-time stage, so documents are scrubbed BEFORE
  * they land anywhere (the compliance posture auditors actually ask
  * for — once raw PII is on disk, deletion is a migration; in the
  * stream it never existed).
  *
  * The whole scrub is ONE stateless projection — the native Luhn-gated
  * [[graft.functions.CardScan]] plus three RE2-safe `regexp_replace`s
  * — so the identical code runs on a structured stream with no state
  * store, no watermark, and exactly-once semantics inherited from the
  * sink (micro-batch ≡ batch pinned in StreamingRedactSpec; the
  * registered lane is the batch replay, the house streaming-lane
  * discipline).
  *
  * Order inside the projection is part of the contract: cards FIRST
  * (the Luhn gate is the most specific detector — running the phone
  * regex first could split a 4-4-4-4 card's digit groups into a
  * phone-shaped match and break the card detection), then the audit
  * counts on the card-redacted text, then the email/phone/ipv4
  * replaces. */
object StreamingRedact {

  /** Scrub `textCol` in place; adds the audit columns
    * `n_card_candidates`, `n_card_valid`, `n_email`, `n_phone`,
    * `n_ipv4` (match counts BEFORE their redaction). Null text
    * null-propagates untouched. */
  def scrubStream(stream: DataFrame, textCol: String = "text"): DataFrame = {
    val carded = Pii.redactCards(stream, textCol)
    val counted = Pii.matchCounts(carded, textCol)
    Pii.redact(counted, textCol)
  }
}
