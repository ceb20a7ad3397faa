package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X19 — stage-0 text cleaning (the C4/CCNet pre-pipeline step): crawl
  * text arrives as HTML-ish markup; every text operator downstream
  * (dedup norms, token counts, quality rules, LM scoring) assumes it is
  * gone. Order matters and is part of the contract:
  *
  *   1. drop `script`/`style` ELEMENTS wholesale (their content is
  *      code, not text — stripping only the tags would leak JavaScript
  *      into the corpus as "words");
  *   2. strip remaining tags to a space (a space, not empty: `a</p><p>b`
  *      must not fuse into `ab`);
  *   3. unescape the numeric-free named entities crawl text actually
  *      carries (amp/lt/gt/quot/apos/nbsp) — `&amp;` LAST, so
  *      `&amp;lt;` decodes to the literal `&lt;` a page displayed, not
  *      to `<` (double-unescape is the classic sanitizer bug);
  *   4. collapse whitespace and trim.
  *
  * Every rule is a single-match codegen'd `regexp_replace`/`replace` —
  * map-only, zero shuffles, and the whole chain replays in DuckDB at
  * the string level (RE2-compatible patterns: no backreferences, no
  * lookaround; reluctant `.*?` is shared syntax).
  */
object TextClean {

  /** The cleaned text expression (null-safe: null stays null). */
  def cleanText(text: Column): Column = {
    // (?is): case-insensitive + dotall, inline flags shared by Java
    // regex and RE2. Reluctant body so adjacent elements don't merge.
    // Two explicit branches, NOT a `</\1>` backreference — RE2 (the
    // DuckDB oracle's engine) has no backreferences; mismatched nesting
    // (<script>...</style>) is left for the tag-strip pass.
    val noScript = regexp_replace(text,
      "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>",
      " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&" // last — see Scaladoc
    ).foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Cleaning audit columns appended to the corpus: `clean_text`,
    * `had_markup` (cleaning changed the text), `n_tok_clean`. */
  def clean(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("clean_text", cleanText(col(textCol)))
      .withColumn("had_markup", !(col("clean_text") <=> col(textCol)))
      .withColumn("n_tok_clean", TextAnalysis.tokenCount(col("clean_text")))

  /** Within-document duplicate-line removal (the C4 "dedup lines in a
    * page" boilerplate strip) — keep the FIRST occurrence of each
    * exact line, preserve order: the native codegen'd
    * [[graft.functions.DedupLines]] expression (one traversal per row;
    * an `aggregate` HOF accumulator would run interpreted and
    * O(lines²)). Line identity is exact bytes — run [[cleanText]]
    * first if markup/entity noise should not block a match. Map-only,
    * zero shuffles; contrast [[graft.ext.SpanDedup]], which dedups
    * spans ACROSS the corpus. */
  def dedupLines(text: Column): Column =
    graft.functions.TextFunctions.dedupLines(text)

  /** Line-dedup audit columns: `line_deduped` (the rewritten text),
    * `n_lines_in`/`n_lines_out` (trailing empties count — the `-1`
    * split limit, matching SQL string_split), `had_dup_lines`. */
  def dedupLinesAudit(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("line_deduped", dedupLines(col(textCol)))
      .withColumn("n_lines_in",
        size(split(col(textCol), "\n", -1)).cast("long"))
      .withColumn("n_lines_out",
        size(split(col("line_deduped"), "\n", -1)).cast("long"))
      .withColumn("had_dup_lines", col("n_lines_in") =!= col("n_lines_out"))
}
