package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ext.TextClean
import graft.functions.TextFunctions

/** S12 — STREAMING stage-0 text cleaning: the full crawl pre-pipeline
  * as ONE stateless projection, so raw crawl text is normalized BEFORE
  * it lands — every batch operator downstream (dedup norms, shingles,
  * token counts, quality rules) then sees exactly the text it assumes.
  *
  * The chain is the X10 funnel's stage-0 ordering, and the order is
  * the contract:
  *
  *   1. [[graft.functions.FixMojibake]] — fix the BYTES first (NFC of
  *      mojibake junk would canonicalize the junk);
  *   2. [[graft.functions.UnicodeNormalize]] NFC — one byte form per
  *      text before anything keys on it;
  *   3. [[TextClean.dedupLines]] — line-level boilerplate BEFORE the
  *      clean pass destroys newlines;
  *   4. [[TextClean.cleanText]] — markup strip + entity unescape +
  *      whitespace collapse.
  *
  * Every step is a per-row codegen'd expression — no state store, no
  * watermark, micro-batch ≡ batch (pinned in StreamingCleanSpec; the
  * registered lane is the batch replay, the house streaming-lane
  * discipline). */
object StreamingClean {

  /** Rewrite `textCol` through the stage-0 chain (null stays null). */
  def cleanStream(stream: DataFrame, textCol: String = "text"): DataFrame =
    stream
      .withColumn(textCol, TextFunctions.fixMojibake(col(textCol)))
      .withColumn(textCol, TextFunctions.unicodeNormalize(col(textCol), "NFC"))
      .withColumn(textCol, TextClean.dedupLines(col(textCol)))
      .withColumn(textCol, TextClean.cleanText(col(textCol)))
}
