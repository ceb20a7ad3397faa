package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X3h — the C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning" §2.2 — the published recipe behind the
  * Colossal Clean Crawled Corpus), the third member of the shipped
  * rule-bundle family next to Gopher ([[Curation.gopherFlags]]) and the
  * linear scorer ([[QualityScore]]). C4 is LINE-structured where Gopher
  * is distribution-structured: it rewrites the page by keeping only
  * lines that look like prose, then gates the page on what survived.
  *
  * Line-level (a line is RETAINED iff all three hold; C4 §2.2 verbatim):
  *  - ends in a terminal punctuation mark (period, exclamation mark,
  *    question mark, end quotation mark);
  *  - has at least five words;
  *  - does not contain the word "javascript" (the onclick-noise rule).
  *
  * Page-level (flags on the ORIGINAL page text — C4 discards these
  * pages outright, so brace/phrase hits are not rescued by the line
  * filter): no curly brace `{` (code, not prose), none of the
  * `blockPhrases` (default: "lorem ipsum" — C4 also used a public
  * bad-word list, pluggable here through the same parameter), and at
  * least three sentences RETAINED (sentence ≈ terminal-punct
  * occurrence in the retained text — C4 counts sentences, not lines).
  *
  * The whole bundle is annotate-don't-filter ([[Curation]] discipline):
  * `c4_text` (the line-filtered rewrite), `c4_lines_in`/`c4_lines_kept`,
  * `c4_sentences`, `c4_has_brace`, `c4_blocked`, `c4_pass` — all
  * appended `c4_`-prefixed (corpus metadata never silently
  * overwritten), so the census is one aggregate over the flags.
  *
  * 100 TB shape: map-only, ZERO shuffles — every rule is a per-row
  * expression (an array `filter` over the line split plus string
  * predicates); the one published C4 rule NOT here is the
  * three-sentence-span dedup across pages, which is corpus-global by
  * nature and already shipped as [[SpanDedup]]. Every predicate
  * replays in DuckDB at the string level (RE2-safe patterns).
  */
object C4 {

  /** Whitespace-trim both ends (ALL whitespace, like Python's
    * `.strip()` in the reference implementation — SQL `trim` only
    * strips spaces, and a line ending "prose.\t" must still pass). */
  private def wstrip(line: Column): Column =
    regexp_replace(line, "^\\s+|\\s+$", "")

  /** The C4 line-retention predicate over one raw line. */
  def lineKeep(line: Column): Column = {
    val t = wstrip(line)
    t.rlike("[.!?\"”]$") &&
      (size(split(t, "\\s+")) >= 5) &&
      !lower(t).contains("javascript")
  }

  /** Append the C4 flag/rewrite columns (see object Scaladoc). */
  def c4Flags(docs: DataFrame, textCol: String = "text",
              blockPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    require(blockPhrases.nonEmpty, "blockPhrases must not be empty")
    val raw = coalesce(col(textCol), lit(""))
    val kept = filter(split(raw, "\n", -1), l => lineKeep(l))
    val blocked = blockPhrases
      .map(p => lower(raw).contains(p.toLowerCase))
      .reduce(_ || _)
    docs
      .withColumn("c4_lines_in", size(split(raw, "\n", -1)).cast("long"))
      .withColumn("c4_text", array_join(kept, "\n"))
      .withColumn("c4_lines_kept", size(kept).cast("long"))
      .withColumn("c4_sentences",
        size(regexp_extract_all(col("c4_text"), lit("[.!?]"), lit(0)))
          .cast("long"))
      .withColumn("c4_has_brace", instr(raw, "{") > 0)
      .withColumn("c4_blocked", blocked)
      .withColumn("c4_pass",
        !col("c4_has_brace") && !col("c4_blocked") &&
          col("c4_sentences") >= 3L)
  }

  /** The filtered corpus: pages passing the gate, text REPLACED by the
    * line-filtered rewrite (what C4 actually ships downstream). */
  def c4Filter(docs: DataFrame, textCol: String = "text",
               blockPhrases: Seq[String] = Seq("lorem ipsum")): DataFrame =
    c4Flags(docs, textCol, blockPhrases)
      .where(col("c4_pass"))
      .withColumn(textCol, col("c4_text"))
      .drop("c4_text", "c4_lines_in", "c4_lines_kept", "c4_sentences",
        "c4_has_brace", "c4_blocked", "c4_pass")
}
