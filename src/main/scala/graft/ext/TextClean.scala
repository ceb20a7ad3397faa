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

  /** Normalized line identity for the CROSS-document dedup: whitespace
    * collapsed, trimmed, lowercased — the same norm discipline as the
    * document-level `normText`, so "Subscribe  Now " and "subscribe
    * now" are the same boilerplate. Whitespace-only lines normalize to
    * `''` and are deliberately EXEMPT from frequency-dropping (blank
    * lines are structure, not boilerplate — and they'd trivially
    * exceed any threshold). */
  def lineNorm(line: Column): Column =
    lower(trim(regexp_replace(line, "\\s+", " ")))

  /** The unit separator as a regex: quoted LITERALLY, so a paragraph
    * separator like `"\n\n"` (the CCNet shard-dedup unit — Wenzek et
    * al. 2020 deduplicate PARAGRAPHS, of which single-newline lines
    * are the degenerate case) splits on the exact byte sequence, not
    * on a regex interpretation of it. */
  private def sepRegex(sep: String): String =
    java.util.regex.Pattern.quote(sep)

  /** The cross-document boilerplate census: normalized lines appearing
    * in at least `minDocFreq` DISTINCT documents, with their document
    * frequency — the drop set of [[dedupLinesAcross]], exposed for
    * auditing what a threshold would remove before committing to it.
    *
    * 100 TB shape: one partial-agg shuffle — the distinct (norm, doc)
    * projection combines map-side, the count is a second partial agg
    * on the already-shuffled key — and the result after the threshold
    * is the boilerplate TAIL, orders of magnitude smaller than the
    * corpus. */
  def boilerplateLines(docs: DataFrame, minDocFreq: Long,
                       textCol: String = "text",
                       keyCol: String = "doc_id",
                       sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2L,
      s"minDocFreq ($minDocFreq) must be >= 2 — at 1 every line drops")
    docs.select(col(keyCol),
        explode(split(coalesce(col(textCol), lit("")), sepRegex(sep), -1))
          .as("line"))
      .select(lineNorm(col("line")).as("line_norm"), col(keyCol))
      .where(col("line_norm") =!= "")
      .distinct()
      .groupBy("line_norm")
      .agg(count(lit(1)).as("line_df"))
      .where(col("line_df") >= minDocFreq)
  }

  /** X19c — CROSS-document boilerplate-line removal (the CCNet
    * shard-level dedup step, Wenzek et al. 2020: crawl boilerplate —
    * cookie banners, nav menus, subscribe footers — is the SAME line
    * on thousands of pages, invisible to within-doc dedup): every line
    * whose normalized form appears in ≥ `minDocFreq` distinct
    * documents is dropped from EVERY document, surviving lines rejoin
    * in original order. Appended columns (corpus columns never
    * overwritten): `text_xdedup` (the rewritten text — `''` if every
    * line was boilerplate), `n_boiler_dropped`, `had_boilerplate`.
    *
    * Document frequency, not raw occurrence count, so a document
    * repeating its own line many times (within-doc dedup's job —
    * [[dedupLines]]) cannot push a private line over the global
    * threshold. Line identity is [[lineNorm]]; whitespace-only lines
    * are exempt (see there). `sep` sets the dedup UNIT (quoted
    * literally): the default `"\n"` dedups lines; `"\n\n"` dedups
    * PARAGRAPHS — CCNet's actual unit, with interior single newlines
    * preserved inside surviving paragraphs (pinned by test).
    *
    * 100 TB shape: the [[boilerplateLines]] census (one partial-agg
    * shuffle; the thresholded drop set is the tiny boilerplate tail,
    * so AQE broadcasts the anti join — the corpus line stream never
    * shuffles for it), then ONE `keyCol` shuffle reassembling kept
    * lines (per-group state = one document's lines, bounded by doc
    * size) and ONE `keyCol` join back to the corpus (co-partitioned
    * with the reassembly output). The explode itself is map-only and
    * carries only (key, pos, line) — document metadata never rides
    * the line stream. */
  def dedupLinesAcross(docs: DataFrame, minDocFreq: Long,
                       textCol: String = "text",
                       keyCol: String = "doc_id",
                       sep: String = "\n"): DataFrame = {
    val heavy = boilerplateLines(docs, minDocFreq, textCol, keyCol, sep)
      .select("line_norm")
    val lines = docs.select(col(keyCol).as("__xd_key"),
        posexplode(split(coalesce(col(textCol), lit("")), sepRegex(sep), -1))
          .as(Seq("__pos", "__line")))
      .withColumn("line_norm", lineNorm(col("__line")))
    val rebuilt = lines.join(heavy, Seq("line_norm"), "left_anti")
      .groupBy(col("__xd_key"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          sep).as("__xtext"),
        count(lit(1)).as("__n_out"))
    docs
      .withColumn("__n_in",
        size(split(coalesce(col(textCol), lit("")), sepRegex(sep), -1))
          .cast("long"))
      .join(rebuilt, col(keyCol) === col("__xd_key"), "left")
      .withColumn("text_xdedup", coalesce(col("__xtext"), lit("")))
      .withColumn("n_boiler_dropped",
        col("__n_in") - coalesce(col("__n_out"), lit(0L)))
      .withColumn("had_boilerplate", col("n_boiler_dropped") > 0L)
      .drop("__xd_key", "__xtext", "__n_out", "__n_in")
  }
}
