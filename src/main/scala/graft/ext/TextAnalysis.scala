package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X3 — text analysis over the `documents` table: token statistics,
  * per-document quality scoring, document fingerprinting, and a
  * language-ID heuristic. North-star extension (LLM-training-data
  * pipeline); every operator is one scan + partial-aggregable groupBy.
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed text (deterministic, portable
    * to the DuckDB oracle's string_split_regex). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Blank-safe whitespace token COUNT: split("") returns [""] (size 1),
    * so blank/null text must count 0 explicitly. The single definition
    * shared by sequence packing and the curation funnel — their
    * n_tokens/n_sequences cross-check depends on bit-identical counts. */
  def tokenCount(c: Column): Column = tokenCountFromToks(c, tokens(c))

  /** [[tokenCount]] over a MATERIALIZED token array — for callers that
    * already carry `tokens(c)` projected (the curation funnel's
    * classifier-gated path) and must not run the split regex twice per
    * row. ONE definition: [[tokenCount]] delegates here. */
  def tokenCountFromToks(c: Column, toks: Column): Column =
    when(c.isNull || length(trim(c)) === 0, lit(0L))
      .otherwise(size(toks).cast("long"))

  /** (token, count) global frequency table, top `k` by count desc then
    * token asc — explode → partial-agg count → TakeOrdered(k). */
  def topTokens(docs: DataFrame, textCol: String = "text", k: Int = 20): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-document quality metrics (classic LLM-corpus quality signals):
    * char/token counts, mean token length, punctuation ratio, stopword
    * ratio, alphabetic ratio. Pure per-row expressions — no shuffle. */
  def docQuality(docs: DataFrame, textCol: String = "text",
                 stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    val t = col(textCol)
    // Tokens materialized once through a projection — the metric columns
    // below each reference the array several times, and HOF lambdas are
    // interpreted, so inlining the split would re-run it per reference
    // (see Dedup.wordShingles).
    val toks = col("__toks")
    val nChars = length(t)
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .withColumn("__toks", tokens(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_token_len",
        round(aggregate(toks, lit(0), (acc, x) => acc + length(x)).cast("double") /
          greatest(size(toks), lit(1)), 4))
      .withColumn("punct_ratio",
        round((nChars - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double") /
          greatest(nChars, lit(1)), 4))
      .withColumn("stopword_ratio",
        round(size(filter(toks, x => array_contains(stopArr, x))).cast("double") /
          greatest(size(toks), lit(1)), 4))
      .withColumn("alpha_ratio",
        round(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
          greatest(nChars, lit(1)), 4))
      .drop("__toks")
  }

  /** Quality metrics aggregated per language — the registered,
    * oracle-checked view of [[docQuality]]. */
  def qualityByLang(docs: DataFrame): DataFrame =
    docQuality(docs)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        // Integer metrics sum exactly; the double ratios accumulate in
        // DECIMAL — `avg(double)` sums in partition order and its rounded
        // digits could differ run-to-run (see Anomaly.zscoreFlags).
        round(sum(col("n_chars")).cast("double") / count(col("n_chars")), 2)
          .as("avg_chars"),
        round(sum(col("n_tokens")).cast("double") / count(col("n_tokens")), 2)
          .as("avg_tokens"),
        round(sum(col("mean_token_len").cast("decimal(24,8)")).cast("double") /
          count(col("mean_token_len")), 4).as("avg_token_len"),
        round(sum(col("stopword_ratio").cast("decimal(24,8)")).cast("double") /
          count(col("stopword_ratio")), 4).as("avg_stopword_ratio"))
      .orderBy("lang")

  /** X3f — within-document repetition (the Gopher-family quality rule:
    * heavily self-repeating documents are low-quality machine text):
    * fraction of duplicated word n-grams per language. All sums are
    * integers; the single double division happens once per output row,
    * so the ratios are partition-order-invariant. Documents with fewer
    * than `n` tokens carry no n-grams and are excluded (documented —
    * matches the oracle's window formulation).
    *
    * Per-document gram counting is the native [[graft.functions
    * .NGramStats]] census — one map-only traversal per row. The r5
    * formulation EXPLODED every gram and shuffled the whole gram stream
    * to a per-document aggregate before the language rollup; at corpus
    * scale that shuffle dwarfed the answer (the per-language result is
    * a handful of rows). Now the only shuffle is the final partial-agg
    * `groupBy(lang)` over per-row integers. */
  def repetitionByLang(docs: DataFrame, textCol: String = "text",
                       n: Int = 2): DataFrame =
    docs
      .select(col("lang"),
        graft.functions.TextFunctions.ngramStats(
          split(Dedup.normText(col(textCol)), "\\s+"), n).as("__g"))
      .select(col("lang"),
        element_at(col("__g"), 1).as("total"),
        element_at(col("__g"), 2).as("dist"))
      .filter(col("total") > 0)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("total")).as("grams_total"),
        sum(col("total") - col("dist")).as("dup_grams"),
        round(sum(col("total") - col("dist")) /
          sum(col("total")).cast("double"), 4).as("dup_frac"))
      .orderBy("lang")

  /** X3g — the Gopher-style document-quality rule bundle (the named
    * heuristic filter stage of Gopher/MassiveText-family pipelines):
    * per-document boolean verdicts for the published reject-rule table —
    * too short / too long, out-of-range mean token length, symbol-heavy,
    * too few distinct stopwords, internally repetitive (duplicate
    * bigrams), duplicate-line and duplicate-paragraph fractions (by
    * count AND by character mass — boilerplate headers are many short
    * lines, a duplicated body is few huge ones; the published table
    * carries both), the top-2/3/4-gram character-share family, and the
    * duplicate-5..10-gram character-share family (thresholds
    * 0.15/0.14/0.13/0.12/0.11/0.10; numerator = char MASS of repeated
    * grams, count·len over every occurrence — the paper dedups
    * overlapping spans, which needs positional bookkeeping for a
    * reject heuristic; the mass reading is ≥ the span reading and
    * monotone in the same repetition, see
    * [[graft.functions.NGramStats]]) — plus the conjunction `pass`.
    *
    * Engine-exactness by construction: every threshold is evaluated in
    * CROSS-MULTIPLIED INTEGER form (`3·n ≤ Σlen ≤ 10·n` instead of
    * `3 ≤ Σlen/n ≤ 10`; `10·dup > 3·lines` for the 0.30 line rule;
    * `5·c₂ > chars` / `50·c₃ > 9·chars` / `25·c₄ > 4·chars` for the
    * 0.20/0.18/0.16 top-gram shares), so no float division ever reaches
    * a comparison and the oracle replays each verdict bit-for-bit.
    * Everything is a per-row expression — the n-gram census (counts,
    * distinct, top-gram coverage) via the native codegen-friendly
    * [[graft.functions.NGramStats]] (one hash-counting traversal per
    * gram size — no interpreted sort/fold), lines/paragraphs via
    * per-row splits — so flagging a 100 TB corpus is ONE map-only
    * pass, no shuffle.
    *
    * SCOPE: the default `symbolClass`/`stopwords` are English/ASCII-
    * centric — every non-Latin-script document counts all its characters
    * as symbols (always `symbol_heavy`) and hits no English stopwords
    * (always `low_stopword`), so `pass` is structurally unreachable for
    * those languages and a per-language census reads as "rule not
    * applicable", NOT as a quality signal. For non-English corpora pass
    * language-appropriate `stopwords` and a script-aware `symbolClass`
    * (e.g. add the relevant Unicode ranges to the keep-class), or apply
    * the bundle behind a language filter.
    * Output: input columns + the metric and flag columns. */
  def gopherFlags(docs: DataFrame, textCol: String = "text",
                  minTokens: Long = 50L, maxTokens: Long = 100000L,
                  minMeanTokLen: Long = 3L, maxMeanTokLen: Long = 10L,
                  stopwords: Seq[String] = Seq("a", "the", "and", "of"),
                  minStopwordHits: Int = 2,
                  symbolClass: String = "[^A-Za-z0-9\\s]"): DataFrame = {
    val t = col(textCol)
    val stopArr = array(stopwords.map(lit): _*)
    gopherCore(docs, textCol,
      toksRaw = tokens(t),
      nTokens = tokenCountFromToks(t, col("__toks")),
      stopHits = size(filter(stopArr,
        s => array_contains(col("__toks"), s))).cast("long"),
      nSymbols = (coalesce(length(t), lit(0)) -
        coalesce(length(regexp_replace(t, symbolClass, "")), lit(0))).cast("long"),
      minTokens = lit(minTokens), maxTokens = lit(maxTokens),
      minMeanTokLen = lit(minMeanTokLen), maxMeanTokLen = lit(maxMeanTokLen),
      minStopwordHits = lit(minStopwordHits.toLong))
  }

  /** Per-language Gopher parameterization — what makes `pass`
    * MEANINGFUL outside English/ASCII (the default `gopherFlags`
    * stopwords/symbolClass make every non-Latin document structurally
    * fail, documented under SCOPE above).
    *
    *  - `stopwords`: the language's high-frequency function words
    *    (public knowledge — the [[langProfiles]] lists for the Latin
    *    languages; single-character particles for zh/ja/ko, which is
    *    what token-equality can match under character tokenization).
    *  - `symbolClass`: regex class of characters COUNTED AS SYMBOLS —
    *    the negation of the language's script ranges (the same BMP
    *    ranges [[languageIdFromTokens]] gates on) + digits/whitespace.
    *    Written with literal range characters, not `\uXXXX` escapes,
    *    so the same string compiles in Java regex AND RE2 (the oracle).
    *  - `charTokens`: zh/ja/ko text has no word delimiters, so the
    *    TOKEN becomes the CHARACTER (`\S` extraction) — the standard
    *    CJK adaptation. Every downstream rule then reads naturally:
    *    n_tokens = character count (the 50-minimum is a sane CJK doc
    *    length), n-gram rules become character-n-gram rules (the
    *    standard CJK repetition signal), and single-char stopwords hit
    *    by token equality. Mean token length is pinned at 1, so the
    *    preset sets `minMeanTokLen = 1` (the rule is vacuous — word
    *    length is not a CJK signal).
    * Unlisted languages fall back to the English defaults. */
  final case class GopherPreset(
      stopwords: Seq[String],
      symbolClass: String = "[^A-Za-z0-9\\s]",
      charTokens: Boolean = false,
      minTokens: Long = 50L, maxTokens: Long = 100000L,
      minMeanTokLen: Long = 3L, maxMeanTokLen: Long = 10L,
      minStopwordHits: Int = 2)

  /** Shipped presets for en/es/fr/de/zh/ja/ko. Latin stopword lists are
    * [[langProfiles]] — ONE definition with language-ID, so the two
    * operators cannot disagree about what counts as a function word.
    * Script ranges: Han U+4E00–U+9FFF, kana U+3040–U+30FF, hangul
    * syllables U+AC00–U+D7A3 — the [[languageIdFromTokens]] gates. */
  // lazy: langProfiles is declared later in this object (kept next to
  // the language-ID code it primarily serves); a strict val here would
  // read it as null during object init.
  /** Symbol class for Latin-script languages WITH diacritics: the
    * ASCII default would count é/ñ/ç/ü/ß as symbols, tripping
    * `symbol_heavy` on perfectly normal es/fr/de text — the keep class
    * adds the Latin-1 letter ranges (À-Ö, Ø-ö, ø-ÿ — U+00C0–U+00FF
    * minus the × and ÷ operators, literal chars so Java regex and RE2
    * read the same string). */
  private val AccentedLatinSymbols = "[^A-Za-zÀ-ÖØ-öø-ÿ0-9\\s]"

  lazy val gopherPresets: Map[String, GopherPreset] = Map(
    "en" -> GopherPreset(langProfiles("en")),
    "es" -> GopherPreset(langProfiles("es"), symbolClass = AccentedLatinSymbols),
    "fr" -> GopherPreset(langProfiles("fr"), symbolClass = AccentedLatinSymbols),
    "de" -> GopherPreset(langProfiles("de"), symbolClass = AccentedLatinSymbols),
    "zh" -> GopherPreset(
      Seq("的", "了", "是", "在", "和", "有", "这", "我"),
      symbolClass = "[^一-鿿0-9\\s]",
      charTokens = true, minMeanTokLen = 1L),
    "ja" -> GopherPreset(
      Seq("の", "に", "は", "を", "が", "と", "で", "も"),
      symbolClass = "[^一-鿿぀-ヿ0-9\\s]",
      charTokens = true, minMeanTokLen = 1L),
    "ko" -> GopherPreset(
      Seq("이", "가", "은", "는", "의", "에", "을", "를"),
      symbolClass = "[^가-힣0-9\\s]",
      charTokens = true, minMeanTokLen = 1L))

  /** [[gopherFlags]] with per-language parameters dispatched on
    * `langCol` — ONE scan, ONE rule chain ([[gopherCore]] is shared, so
    * the per-language and fixed-parameter paths cannot diverge): every
    * language-dependent input becomes a `when` chain, and `when` only
    * evaluates the taken branch per row, so a corpus pays one
    * tokenization and one symbol-class regex per document regardless
    * of how many presets ship. Languages not in `presets` use
    * `default`. */
  def gopherFlagsByLang(docs: DataFrame,
                        presets: Map[String, GopherPreset] = gopherPresets,
                        langCol: String = "lang", textCol: String = "text",
                        default: GopherPreset = GopherPreset(
                          Seq("a", "the", "and", "of"))): DataFrame = {
    val t = col(textCol)
    val ps = presets.toSeq.sortBy(_._1) // deterministic chain order
    def sel(f: GopherPreset => Column): Column =
      ps.foldLeft(f(default)) { case (acc, (lang, p)) =>
        when(col(langCol) === lang, f(p)).otherwise(acc)
      }
    gopherCore(docs, textCol,
      toksRaw = sel(p =>
        if (p.charTokens) regexp_extract_all(t, lit("\\S"), lit(0)) else tokens(t)),
      // Char mode: size of the (coalesced) token array — regexp_extract_all
      // of blank text is [], so no blank-guard needed; ws mode reuses the
      // MATERIALIZED __toks through tokenCountFromToks (same verdicts as
      // Packing's tokenCount, without a second split per row).
      nTokens = sel(p =>
        if (p.charTokens) size(col("__toks")).cast("long")
        else tokenCountFromToks(t, col("__toks"))),
      stopHits = sel(p => size(filter(array(p.stopwords.map(lit): _*),
        s => array_contains(col("__toks"), s))).cast("long")),
      nSymbols = sel(p => (coalesce(length(t), lit(0)) -
        coalesce(length(regexp_replace(t, p.symbolClass, "")), lit(0)))
        .cast("long")),
      minTokens = sel(p => lit(p.minTokens)),
      maxTokens = sel(p => lit(p.maxTokens)),
      minMeanTokLen = sel(p => lit(p.minMeanTokLen)),
      maxMeanTokLen = sel(p => lit(p.maxMeanTokLen)),
      minStopwordHits = sel(p => lit(p.minStopwordHits.toLong)))
  }

  /** The ONE rule chain under both [[gopherFlags]] and
    * [[gopherFlagsByLang]]: callers supply the tokenization, the
    * stopword-hit and symbol counts (expressions over the materialized
    * `__toks` / text), and the thresholds as Columns (literals or
    * per-language `when` chains — same plan shape either way). */
  private def gopherCore(docs: DataFrame, textCol: String,
                         toksRaw: Column, nTokens: Column,
                         stopHits: Column, nSymbols: Column,
                         minTokens: Column, maxTokens: Column,
                         minMeanTokLen: Column, maxMeanTokLen: Column,
                         minStopwordHits: Column): DataFrame = {
    val t = col(textCol)
    val toks = col("__toks")
    docs
      // coalesce: tokens(null) is a null array, which would null-poison
      // every flag; a null doc must flag as too_short, not as unknown.
      .withColumn("__toks", coalesce(toksRaw, array().cast("array<string>")))
      .withColumn("n_tokens", nTokens)
      .withColumn("sum_tok_len",
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)))
      .withColumn("n_chars", coalesce(length(t), lit(0)).cast("long"))
      .withColumn("n_symbols", nSymbols)
      .withColumn("stop_hits", stopHits)
      // ONE fused native census for every gram size 2..10 (sizes 2-4
      // feed the top-share rules, 5-10 the dup-share rules): a single
      // traversal builds the space-joined doc bytes once and reads each
      // size's [n_grams, distinct, top-chars, dup-chars] quadruple out
      // of the flat array — VERDICT r9 top-next (the nine separate
      // per-size censuses were the #1 bench cost). Index arithmetic is
      // localized in gIdx; still one map-only pass over the corpus.
      .withColumn("__gm", graft.functions.TextFunctions.ngramStatsMulti(toks, 2, 10))
      .withColumn("n_bigrams", gIdx(2, 1))
      .withColumn("dup_bigrams", gIdx(2, 1) - gIdx(2, 2))
      // Lines: non-empty elements of the '\n' split. Paragraphs: blank-
      // line-separated blocks ('\n{2,}' split) that are non-blank after
      // trim. Null text yields empty arrays via the coalesce below.
      .withColumn("__lines",
        filter(coalesce(split(t, "\n"), array().cast("array<string>")),
          l => length(l) > 0))
      .withColumn("__paras",
        filter(coalesce(split(t, "\n{2,}"), array().cast("array<string>")),
          p => length(trim(p)) > 0))
      // Distinct arrays materialized ONCE: the count and char-mass rules
      // below each need them, and array_distinct re-evaluated per
      // reference would double that per-row work.
      .withColumn("__dlines", array_distinct(col("__lines")))
      .withColumn("__dparas", array_distinct(col("__paras")))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("dup_lines",
        (size(col("__lines")) - size(col("__dlines"))).cast("long"))
      .withColumn("n_paras", size(col("__paras")).cast("long"))
      .withColumn("dup_paras",
        (size(col("__paras")) - size(col("__dparas"))).cast("long"))
      // Characters inside repeat occurrences: Σlen(all) − Σlen(distinct).
      .withColumn("dup_line_chars",
        aggregate(col("__lines"), lit(0L), (acc, x) => acc + length(x)) -
          aggregate(col("__dlines"), lit(0L), (acc, x) => acc + length(x)))
      .withColumn("dup_para_chars",
        aggregate(col("__paras"), lit(0L), (acc, x) => acc + length(x)) -
          aggregate(col("__dparas"), lit(0L), (acc, x) => acc + length(x)))
      .withColumn("top_2gram_chars", gIdx(2, 3))
      .withColumn("top_3gram_chars", gIdx(3, 3))
      .withColumn("top_4gram_chars", gIdx(4, 3))
      .withColumn("dup_5gram_chars", gIdx(5, 4))
      .withColumn("dup_6gram_chars", gIdx(6, 4))
      .withColumn("dup_7gram_chars", gIdx(7, 4))
      .withColumn("dup_8gram_chars", gIdx(8, 4))
      .withColumn("dup_9gram_chars", gIdx(9, 4))
      .withColumn("dup_10gram_chars", gIdx(10, 4))
      .withColumn("too_short", col("n_tokens") < minTokens)
      .withColumn("too_long", col("n_tokens") > maxTokens)
      .withColumn("bad_tok_len",
        !(minMeanTokLen * col("n_tokens") <= col("sum_tok_len") &&
          col("sum_tok_len") <= maxMeanTokLen * col("n_tokens")))
      .withColumn("symbol_heavy", lit(10L) * col("n_symbols") > col("n_chars"))
      .withColumn("low_stopword", col("stop_hits") < minStopwordHits)
      .withColumn("repetitive",
        col("n_bigrams") > 0 && lit(5L) * col("dup_bigrams") >= col("n_bigrams"))
      // Gopher's structural-duplication rules: > 0.30 of lines /
      // paragraphs duplicated, or the most frequent word 2/3/4-gram
      // covering > 0.20 / 0.18 / 0.16 of the characters.
      .withColumn("dup_line_heavy",
        lit(10L) * col("dup_lines") > lit(3L) * col("n_lines"))
      .withColumn("dup_para_heavy",
        lit(10L) * col("dup_paras") > lit(3L) * col("n_paras"))
      .withColumn("dup_line_chars_heavy",
        lit(5L) * col("dup_line_chars") > col("n_chars"))
      .withColumn("dup_para_chars_heavy",
        lit(5L) * col("dup_para_chars") > col("n_chars"))
      .withColumn("top_2gram_heavy",
        lit(5L) * col("top_2gram_chars") > col("n_chars"))
      .withColumn("top_3gram_heavy",
        lit(50L) * col("top_3gram_chars") > lit(9L) * col("n_chars"))
      .withColumn("top_4gram_heavy",
        lit(25L) * col("top_4gram_chars") > lit(4L) * col("n_chars"))
      // Duplicate-n-gram char-share rules, published thresholds in
      // integer form: 0.15 = 3/20, 0.14 = 7/50, 0.13 = 13/100,
      // 0.12 = 3/25, 0.11 = 11/100, 0.10 = 1/10.
      .withColumn("dup_5gram_heavy",
        lit(20L) * col("dup_5gram_chars") > lit(3L) * col("n_chars"))
      .withColumn("dup_6gram_heavy",
        lit(50L) * col("dup_6gram_chars") > lit(7L) * col("n_chars"))
      .withColumn("dup_7gram_heavy",
        lit(100L) * col("dup_7gram_chars") > lit(13L) * col("n_chars"))
      .withColumn("dup_8gram_heavy",
        lit(25L) * col("dup_8gram_chars") > lit(3L) * col("n_chars"))
      .withColumn("dup_9gram_heavy",
        lit(100L) * col("dup_9gram_chars") > lit(11L) * col("n_chars"))
      .withColumn("dup_10gram_heavy",
        lit(10L) * col("dup_10gram_chars") > col("n_chars"))
      .withColumn("pass",
        !col("too_short") && !col("too_long") && !col("bad_tok_len") &&
          !col("symbol_heavy") && !col("low_stopword") && !col("repetitive") &&
          !col("dup_line_heavy") && !col("dup_para_heavy") &&
          !col("dup_line_chars_heavy") && !col("dup_para_chars_heavy") &&
          !col("top_2gram_heavy") && !col("top_3gram_heavy") &&
          !col("top_4gram_heavy") &&
          !col("dup_5gram_heavy") && !col("dup_6gram_heavy") &&
          !col("dup_7gram_heavy") && !col("dup_8gram_heavy") &&
          !col("dup_9gram_heavy") && !col("dup_10gram_heavy"))
      .drop("__toks", "__gm", "__lines", "__paras", "__dlines", "__dparas")
  }

  /** 1-based `element_at` index into the fused `__gm` census for gram
    * size `n` (2..10), `field` 1..4 = [n_grams, distinct, top-gram
    * chars, dup-gram char mass] — the NGramStatsMulti flat layout. */
  private def gIdx(n: Int, field: Int): Column =
    element_at(col("__gm"), 4 * (n - 2) + field)

  /** [[gopherFlags]] under ONE [[GopherPreset]] (charTokens honored —
    * the single-preset form of [[gopherFlagsByLang]]'s dispatch, for
    * callers gating a known-language corpus, e.g. the X10 funnel's
    * `Config.gopherPreset`). Same shared [[gopherCore]] rule chain. */
  def gopherFlags(docs: DataFrame, textCol: String,
                  preset: GopherPreset): DataFrame = {
    val t = col(textCol)
    gopherCore(docs, textCol,
      toksRaw =
        if (preset.charTokens) regexp_extract_all(t, lit("\\S"), lit(0))
        else tokens(t),
      nTokens =
        if (preset.charTokens) size(col("__toks")).cast("long")
        else tokenCountFromToks(t, col("__toks")),
      stopHits = size(filter(array(preset.stopwords.map(lit): _*),
        s => array_contains(col("__toks"), s))).cast("long"),
      nSymbols = (coalesce(length(t), lit(0)) -
        coalesce(length(regexp_replace(t, preset.symbolClass, "")), lit(0)))
        .cast("long"),
      minTokens = lit(preset.minTokens), maxTokens = lit(preset.maxTokens),
      minMeanTokLen = lit(preset.minMeanTokLen),
      maxMeanTokLen = lit(preset.maxMeanTokLen),
      minStopwordHits = lit(preset.minStopwordHits.toLong))
  }

  /** Every column [[gopherCore]] APPENDS (or overwrites) on its input —
    * the restore contract for callers that gate on `pass` and must
    * return the frame unchanged otherwise (the funnel's stash/drop
    * dance in [[graft.ext.Curation.annotate]]). Kept in the chain's
    * order; TextAnalysisSpec pins it against the actual output diff so
    * a new metric column cannot silently leak through a consumer. */
  val gopherAddedColumns: Seq[String] = Seq(
    "n_tokens", "sum_tok_len", "n_chars", "n_symbols", "stop_hits",
    "n_bigrams", "dup_bigrams", "n_lines", "dup_lines", "n_paras",
    "dup_paras", "dup_line_chars", "dup_para_chars",
    "top_2gram_chars", "top_3gram_chars", "top_4gram_chars",
    "dup_5gram_chars", "dup_6gram_chars", "dup_7gram_chars",
    "dup_8gram_chars", "dup_9gram_chars", "dup_10gram_chars",
    "too_short", "too_long", "bad_tok_len", "symbol_heavy",
    "low_stopword", "repetitive", "dup_line_heavy", "dup_para_heavy",
    "dup_line_chars_heavy", "dup_para_chars_heavy",
    "top_2gram_heavy", "top_3gram_heavy", "top_4gram_heavy",
    "dup_5gram_heavy", "dup_6gram_heavy", "dup_7gram_heavy",
    "dup_8gram_heavy", "dup_9gram_heavy", "dup_10gram_heavy", "pass")

  /** Per-language rule census over [[gopherFlags]] — the registered,
    * oracle-checked view: one partial-agg groupBy over the map-only
    * flag pass. */
  def gopherSummary(docs: DataFrame, textCol: String = "text"): DataFrame =
    summarizeGopher(gopherFlags(docs, textCol), "lang")

  /** The census over the PRESET-dispatched flags — same aggregate,
    * grouped by the SAME column the presets dispatched on. */
  def gopherSummaryByLang(docs: DataFrame,
                          presets: Map[String, GopherPreset] = gopherPresets,
                          langCol: String = "lang",
                          textCol: String = "text"): DataFrame =
    summarizeGopher(gopherFlagsByLang(docs, presets, langCol, textCol), langCol)

  private def summarizeGopher(f: DataFrame, groupCol: String): DataFrame = {
    def cnt(c: String) = count(when(col(c), lit(1))).as(s"n_$c")
    f.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        cnt("too_short"), cnt("too_long"), cnt("bad_tok_len"),
        cnt("symbol_heavy"), cnt("low_stopword"), cnt("repetitive"),
        cnt("dup_line_heavy"), cnt("dup_para_heavy"),
        cnt("dup_line_chars_heavy"), cnt("dup_para_chars_heavy"),
        cnt("top_2gram_heavy"), cnt("top_3gram_heavy"),
        cnt("top_4gram_heavy"),
        cnt("dup_5gram_heavy"), cnt("dup_6gram_heavy"),
        cnt("dup_7gram_heavy"), cnt("dup_8gram_heavy"),
        cnt("dup_9gram_heavy"), cnt("dup_10gram_heavy"),
        cnt("pass"))
      .orderBy(groupCol)
  }

  /** Document fingerprinting: md5 of the normalized text (exact-dup
    * grouping key; portable — DuckDB md5() emits the same hex).
    * Summary per source: doc count, distinct fingerprints (dup detection),
    * and min/max fingerprint as content witnesses. */
  def fingerprintSummary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", Dedup.fingerprintOf(col(textCol)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("distinct_fp"),
        min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))
      .orderBy("source")

  /** Rolling fingerprint over the token stream — an order-sensitive
    * 64-bit content hash, unlike the order-insensitive
    * md5-of-normalized-text. A hash chain (fold of xxhash64 over
    * (acc, token-hash)) rather than the classic polynomial acc*31+h:
    * multiplication overflows under ANSI mode, a chain hash can't. */
  def rollingFingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => xxhash64(acc, xxhash64(t)))

  /** BPE-style pre-tokenization pattern (simplified GPT-2-family shape:
    * letter runs, digit runs, punctuation runs, each with an optional
    * leading space — kept to syntax shared by Java regex and RE2 so the
    * DuckDB oracle tokenizes identically). */
  val bpeIshPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** Token counting both ways a data pipeline needs them: cheap
    * whitespace splitting and a BPE-ish regex pre-tokenization (the
    * better proxy for LLM token budgets). Per-language totals. */
  def tokenCountsByLang(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("lang"),
        size(tokens(col(textCol))).as("ws"),
        size(regexp_extract_all(col(textCol), lit(bpeIshPattern), lit(0))).as("bpe"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        round(avg(col("bpe")), 2).as("avg_bpe_tokens"))
      .orderBy("lang")

  /** Language-ID heuristic (n-gram/stopword profile, public-knowledge
    * approach): CJK-dominant text → zh; otherwise argmax of per-language
    * marker-token hits; `und` when nothing matches. The marker profiles
    * are the classic high-frequency function words per language. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))

  /** Convenience single-column form. NOTE: inlines the token split into
    * the four per-language filter HOFs — interpreted lambdas re-evaluate
    * it per language. Hot paths should materialize the tokens through
    * their own projection and call [[languageIdFromTokens]] (what
    * [[langConfusion]] does — measurably faster at sf0.1). */
  def languageId(textCol: Column): Column =
    languageIdFromTokens(textCol, tokens(lower(textCol)))

  /** Language-ID from a pre-materialized lowercase token array.
    *
    * Script gates run BEFORE the stopword argmax, most-specific first:
    * kana (hiragana U+3040–U+309F + katakana U+30A0–U+30FF) is unique
    * to Japanese, so ANY meaningful kana presence (> 5% — ja mixes
    * kanji and kana, so a 30% bar would miss kanji-heavy text) decides
    * ja; hangul syllables (U+AC00–U+D7A3) decide ko at the same 30%
    * bar as han→zh. The han gate comes LAST of the three: Japanese and
    * (rarely) Korean text contains han characters, so testing han first
    * would mislabel ja/ko as zh — and a wrong lang corrupts per-language
    * mixing rates downstream (X12 consumes `lang`). */
  def languageIdFromTokens(textCol: Column, toks: Column): Column = {
    def scriptRatio(charClass: String): Column =
      (length(textCol) -
        length(regexp_replace(textCol, charClass, ""))).cast("double") /
        greatest(length(textCol), lit(1))
    val kanaRatio = scriptRatio("[\\u3040-\\u30ff]")
    val hangulRatio = scriptRatio("[\\uac00-\\ud7a3]")
    val cjkRatio = scriptRatio("[\\u4e00-\\u9fff]")
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val wordArr = array(words.map(lit): _*)
      (lang, size(filter(toks, t => array_contains(wordArr, t))))
    }
    // array_max over (score, lang) structs: linear expression size (a
    // when-fold would duplicate subtrees exponentially — see IvfIndex).
    val best = array_max(array(scores.map { case (lang, score) =>
      struct(score.as("score"), lit(lang).as("lang"))
    }: _*))
    when(kanaRatio > lit(0.05), lit("ja"))
      .when(hangulRatio > lit(0.3), lit("ko"))
      .when(cjkRatio > lit(0.3), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Confusion counts of predicted vs labeled language over a corpus.
    * The token array goes through its own projection so the four
    * per-language interpreted filter lambdas share ONE split per row
    * (the HOF-inlining trap — see [[docQuality]]). */
  def langConfusion(docs: DataFrame, textCol: String = "text",
                    labelCol: String = "lang"): DataFrame =
    docs.select(col(labelCol).as("label"), col(textCol).as("__text"))
      .withColumn("__toks", tokens(lower(col("__text"))))
      .select(col("label"),
        languageIdFromTokens(col("__text"), col("__toks")).as("predicted"))
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("label", "predicted")
}
