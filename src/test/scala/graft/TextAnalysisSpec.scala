package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** X3 text analysis: quality metrics, token stats, fingerprints,
  * language-ID heuristic (real-language samples — the synthetic corpus
  * shares one vocabulary, so language behavior is pinned here). */
class TextAnalysisSpec extends SparkSpec {

  test("gopherAddedColumns is exactly what gopherFlags appends") {
    // The restore contract consumers rely on (Curation's stash/drop):
    // a new metric column added to gopherCore without updating the
    // list would leak through the funnel's annotated frame.
    val d = df(Seq(org.apache.spark.sql.Row(1L, "the quick brown fox")),
      "doc_id BIGINT, text STRING")
    val added = graft.ext.TextAnalysis.gopherFlags(d, "text").columns
      .filterNot(d.columns.contains)
    assert(added.toSeq == graft.ext.TextAnalysis.gopherAddedColumns)
  }

  test("docQuality computes hand-checked metrics") {
    val docs = df(Seq(Row(1L, "the cat sat, on a mat!")), "doc_id BIGINT, text STRING")
    val r = TextAnalysis.docQuality(docs).head()
    assert(r.getAs[Int]("n_tokens") == 6)
    // tokens: the(3) cat(3) sat,(4) on(2) a(1) mat!(4) → 17/6
    assert(math.abs(r.getAs[Double]("mean_token_len") - 2.8333) < 1e-4)
    // 2 punct chars of 22 chars
    assert(math.abs(r.getAs[Double]("punct_ratio") - 0.0909) < 1e-4)
    // stopwords {a, the}: 2 of 6 tokens
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.3333) < 1e-4)
  }

  test("topTokens orders by count desc then token asc") {
    val docs = df(Seq(Row(1L, "b b a a c")), "doc_id BIGINT, text STRING")
    val top = TextAnalysis.topTokens(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 2L), ("b", 2L))) // tie → lexicographic
  }

  test("fingerprintSummary collapses normalized duplicates") {
    val docs = df(Seq(
      Row(1L, "Hello  World", "s1"),
      Row(2L, "hello world", "s1"),   // same after normalization
      Row(3L, "different", "s1")),
      "doc_id BIGINT, text STRING, source STRING")
    val r = TextAnalysis.fingerprintSummary(docs).head()
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("distinct_fp") == 2L)
  }

  test("rollingFingerprint is order-sensitive where md5-of-set is not") {
    val docs = df(Seq(Row(1L, "alpha beta"), Row(2L, "beta alpha")),
      "doc_id BIGINT, text STRING")
    val fps = docs.select(TextAnalysis.rollingFingerprint(col("text")))
      .collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
  }

  test("languageId identifies real-language samples") {
    val samples = df(Seq(
      Row("en", "the cat is sitting in that house and the dog is there"),
      Row("es", "el perro corre por la calle y los gatos duermen con una manta"),
      Row("fr", "le chien et les chats sont dans une maison qui est dans la rue"),
      Row("de", "der hund und die katze sind nicht in das haus mit ein auto"),
      Row("zh", "这是一个关于猫和狗的故事他们住在一起"),
      // ja/ko script gates (ADVICE r5: kana/hangul used to fall through
      // to zh): kana-heavy, kanji-heavy-with-kana-particles, and hangul.
      Row("ja", "これは日本語のテストですきょうは天気がいいです"),
      Row("ja", "日本語の文章です"), // mostly kanji — particles alone must decide ja
      Row("ko", "이것은 한국어 테스트 입니다 오늘은 날씨가 좋습니다"),
      Row("und", "zzz qqq xxx yyy")),
      "expected STRING, text STRING")
    val preds = samples
      .select(col("expected"), TextAnalysis.languageId(col("text")).as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    preds.foreach { case (expected, got) => assert(got == expected,
      s"expected $expected, predicted $got") }
    assert(preds.count(_._1 == "ja") == 2) // both ja fixtures asserted
  }

  test("langConfusion aggregates prediction counts by label") {
    val docs = Tables.documents(spark, sfDir)
    val conf = TextAnalysis.langConfusion(docs)
    val total = conf.agg(sum("n")).head().getLong(0)
    assert(total == docs.count()) // every doc lands in exactly one cell
  }

  test("gopherFlags: each rule fires on its planted fixture and only there") {
    // The pass fixture is 44 tokens: on a ~14-token doc ANY 4-gram
    // covers > 16% of the chars, so the (unconditional, Gopher-faithful)
    // top-gram rule would fire — in the default config minTokens=50
    // already rejects docs that short before dominance is meaningful.
    val passDoc = "the a and of " + (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = df(Seq(
      Row(1L, "en", passDoc),                                  // pass
      Row(2L, "en", "tiny the and doc"),                            // too_short (min 5 below)
      Row(3L, "en", "the extraordinarily incomprehensible and of " +
        "unquestionably extraordinarily incomprehensible extraordinarily"), // bad_tok_len (mean > 10)
      Row(4L, "en", "the !!! ### $$$ %%% and of cash"),             // symbol_heavy
      Row(5L, "en", "one two three four five six seven"),           // low_stopword (0 hits)
      Row(6L, "en", "the spam and spam the spam and spam the spam and spam of it"), // repetitive? check
      Row(7L, "en", null)),                                         // null → too_short, no null flags
      "doc_id BIGINT, lang STRING, text STRING")
    val f = graft.ext.TextAnalysis.gopherFlags(docs, minTokens = 5L)
      .orderBy("doc_id").collect()
    def flags(i: Int) = Seq("too_short", "too_long", "bad_tok_len",
      "symbol_heavy", "low_stopword", "repetitive").filter(c => f(i).getAs[Boolean](c))
    assert(f(0).getAs[Boolean]("pass"), s"doc 1 must pass: ${flags(0)}")
    assert(flags(1) == Seq("too_short"))
    assert(flags(2).contains("bad_tok_len"))
    assert(flags(3).contains("symbol_heavy"))
    assert(flags(4) == Seq("low_stopword"))
    assert(flags(5) == Seq("repetitive"))
    assert(flags(6).contains("too_short")) // null text: flagged, not null
    val flagCols = Seq("too_short", "too_long", "bad_tok_len",
      "symbol_heavy", "low_stopword", "repetitive", "pass")
    f.foreach(r => flagCols.foreach(c =>
      assert(!r.isNullAt(r.fieldIndex(c)), s"$c null-poisoned on doc ${r.getLong(0)}")))
  }

  test("gopherFlags repetitive rule: 20% duplicated bigrams trips it") {
    val docs = df(Seq(
      Row(1L, "x", "go go go go go and the stop of it"),  // dup bigrams >= 20%
      Row(2L, "x", "all of the tokens and here differ")), // 0 dups
      "doc_id BIGINT, lang STRING, text STRING")
    val f = graft.ext.TextAnalysis.gopherFlags(docs, minTokens = 2L)
      .orderBy("doc_id").collect()
    assert(f(0).getAs[Boolean]("repetitive"))
    assert(!f(1).getAs[Boolean]("repetitive"))
  }

  test("gopherSummary counts equal the per-doc flag frame it summarizes") {
    val d = Tables.documents(spark, sfDir)
    val s = graft.ext.TextAnalysis.gopherSummary(d).collect()
    assert(s.map(_.getAs[Long]("n_docs")).sum == d.count())
    // Recompute every census column from the per-doc flags independently:
    // pass + at-least-one-failure must PARTITION each lang's docs, and
    // each flag count must match a direct count over the flag frame.
    val flags = graft.ext.TextAnalysis.gopherFlags(d).collect()
      .groupBy(_.getAs[String]("lang"))
    s.foreach { r =>
      val f = flags(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == f.length.toLong)
      assert(r.getAs[Long]("n_pass") == f.count(_.getAs[Boolean]("pass")).toLong)
      assert(r.getAs[Long]("n_pass") +
        f.count(!_.getAs[Boolean]("pass")) == f.length.toLong)
      for (c <- Seq("too_short", "too_long", "bad_tok_len",
          "symbol_heavy", "low_stopword", "repetitive",
          "dup_line_heavy", "dup_para_heavy",
          "dup_line_chars_heavy", "dup_para_chars_heavy",
          "top_2gram_heavy", "top_3gram_heavy", "top_4gram_heavy"))
        assert(r.getAs[Long](s"n_$c") == f.count(_.getAs[Boolean](c)).toLong, c)
    }
  }

  test("gopher structural rules: dup lines, dup paragraphs, dominant n-grams") {
    // 44 tokens: long enough that no single 4-gram covers > 16% of the
    // chars (on a ~24-token doc ANY 4-gram would — the rule is scoped
    // to reasonably sized docs, like Gopher's).
    val base = "the a and of " + (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = df(Seq(
      Row(1L, "en", base),                                    // clean: no structural flags
      Row(2L, "en", base + "\ndup line x\ndup line x"),       // 1 of 3 lines duplicated
      Row(3L, "en", base + "\n\nsame para\n\nsame para"),     // 1 of 3 paragraphs duplicated
      Row(4L, "en", base + " badger badger" * 15)),           // one 2-gram dominates the chars
      "doc_id BIGINT, lang STRING, text STRING")
    val f = graft.ext.TextAnalysis.gopherFlags(docs, minTokens = 5L)
      .orderBy("doc_id").collect()
    val structural = Seq("dup_line_heavy", "dup_para_heavy",
      "dup_line_chars_heavy", "dup_para_chars_heavy",
      "top_2gram_heavy", "top_3gram_heavy", "top_4gram_heavy")
    structural.foreach(c => assert(!f(0).getAs[Boolean](c), s"clean doc flagged $c"))
    assert(f(0).getAs[Boolean]("pass"))
    assert(f(1).getAs[Boolean]("dup_line_heavy"))
    assert(!f(1).getAs[Boolean]("dup_para_heavy"))
    assert(f(2).getAs[Boolean]("dup_para_heavy"))
    assert(f(3).getAs[Boolean]("top_2gram_heavy"))
    assert(f(3).getAs[Boolean]("top_3gram_heavy")) // 'badger badger badger' runs
    assert(f(3).getAs[Boolean]("top_4gram_heavy"))
    assert(!f(3).getAs[Boolean]("pass"))
    // Metric arithmetic spot-checks (the integer cross-multiply inputs).
    assert(f(1).getAs[Long]("n_lines") == 3L && f(1).getAs[Long]("dup_lines") == 1L)
    assert(f(2).getAs[Long]("n_paras") == 3L && f(2).getAs[Long]("dup_paras") == 1L)
    // doc 4: 'badger badger' appears 29 times in the 30-badger run,
    // each occurrence 13 chars.
    assert(f(3).getAs[Long]("top_2gram_chars") == 29L * 13L)
  }

  test("gopher char-mass duplication: few huge duplicate lines beat the count rule") {
    // One duplicated LONG line among many distinct short ones: the
    // count fraction (2 dups of 12 lines = 17%) stays under 30%, but
    // the duplicated characters dominate — the char rule catches what
    // the count rule misses (why the published table carries both).
    val longLine = ("the a and of " + (1 to 30).map(i => s"w$i").mkString(" "))
    val shorts = (1 to 10).map(i => s"s$i").mkString("\n")
    val docs = df(Seq(
      Row(1L, "en", s"$longLine\n$longLine\n$longLine\n$shorts")),
      "doc_id BIGINT, lang STRING, text STRING")
    val f = graft.ext.TextAnalysis.gopherFlags(docs, minTokens = 5L).head()
    assert(!f.getAs[Boolean]("dup_line_heavy"),
      s"count rule should NOT fire: ${f.getAs[Long]("dup_lines")}/${f.getAs[Long]("n_lines")}")
    assert(f.getAs[Boolean]("dup_line_chars_heavy"))
    // dup chars = 2 extra occurrences of the long line.
    assert(f.getAs[Long]("dup_line_chars") == 2L * longLine.length)
  }

  test("gopher dup-ngram char-share rules: repeated long phrases trip 5..10-gram flags") {
    // Doc 2 repeats a 12-token phrase 6 times inside otherwise-distinct
    // filler: every window of sizes 5..10 inside the phrase recurs 6
    // times, so the dup char mass dominates. Doc 1 (all-distinct
    // tokens) has zero dup mass at every size.
    val filler = (1 to 60).map(i => s"tok$i").mkString(" ")
    val phrase = (1 to 12).map(i => s"rep$i").mkString(" ")
    val docs = df(Seq(
      Row(1L, "en", "the a and of " + filler),
      Row(2L, "en", "the a and of " + (1 to 6).map(i => s"$phrase fill$i").mkString(" "))),
      "doc_id BIGINT, lang STRING, text STRING")
    val f = graft.ext.TextAnalysis.gopherFlags(docs, minTokens = 5L)
      .orderBy("doc_id").collect()
    (5 to 10).foreach { k =>
      assert(!f(0).getAs[Boolean](s"dup_${k}gram_heavy"), s"clean doc flagged $k")
      assert(f(0).getAs[Long](s"dup_${k}gram_chars") == 0L, s"clean doc mass $k")
      assert(f(1).getAs[Boolean](s"dup_${k}gram_heavy"), s"repeated doc not flagged $k")
    }
    assert(f(0).getAs[Boolean]("pass"))
    assert(!f(1).getAs[Boolean]("pass"))
    // Exact mass pin at one size: 8 distinct 5-gram windows inside the
    // 12-token phrase recur exactly 6 times each (the windows crossing
    // into fillN are unique), so mass = Σ 6·len(window).
    val phraseToks = (1 to 12).map(i => s"rep$i")
    val expected5 = (0 to 7).map { s =>
      6L * phraseToks.slice(s, s + 5).mkString(" ").length
    }.sum
    assert(f(1).getAs[Long]("dup_5gram_chars") == expected5)
  }

  test("per-language presets: zh/ja/ko fixture docs PASS; symbol-heavy zh fails; en unchanged") {
    import spark.implicits._
    val fixtures = Queries.gopherCjkFixtures.toDF("doc_id", "lang", "text")
      .withColumn("lang", col("lang"))
    val f = graft.ext.TextAnalysis.gopherFlagsByLang(fixtures)
      .orderBy(col("doc_id").desc).collect() // -1, -2, -3, -4
    val byId = f.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(-1L).getAs[Boolean]("pass"), "zh fixture must pass under the zh preset")
    assert(byId(-2L).getAs[Boolean]("pass"), "ja fixture must pass under the ja preset")
    assert(byId(-4L).getAs[Boolean]("pass"), "ko fixture must pass under the ko preset")
    assert(byId(-3L).getAs[Boolean]("symbol_heavy") && !byId(-3L).getAs[Boolean]("pass"),
      "ASCII noise under a Han keep class must flag symbol_heavy")
    // Character tokenization: n_tokens == count of non-whitespace chars.
    val zhText = Queries.gopherCjkFixtures.head._3
    assert(byId(-1L).getAs[Long]("n_tokens") == zhText.count(!_.isWhitespace))
    // The same doc under the DEFAULT (English) rules is structurally
    // unpassable — the documented SCOPE gap the presets close.
    val defaulted = graft.ext.TextAnalysis.gopherFlags(fixtures).orderBy(col("doc_id").desc)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(defaulted(-1L).getAs[Boolean]("symbol_heavy"))
    assert(defaulted(-1L).getAs[Boolean]("low_stopword"))
    assert(!defaulted(-1L).getAs[Boolean]("pass"))
    // An English doc gets identical verdicts from both paths (the en
    // preset's wider stopword list can only help stop_hits; pin a doc
    // where both clear the rule).
    val en = df(Seq(Row(1L, "en",
      "the a and of " + (1 to 46).map(i => s"word$i").mkString(" "))),
      "doc_id BIGINT, lang STRING, text STRING")
    val viaPreset = graft.ext.TextAnalysis.gopherFlagsByLang(en).head()
    val viaDefault = graft.ext.TextAnalysis.gopherFlags(en).head()
    assert(viaPreset.getAs[Boolean]("pass") == viaDefault.getAs[Boolean]("pass"))
    // Accented Latin letters are NOT symbols under the es/fr/de presets:
    // an ordinary accent-dense French sentence would trip symbol_heavy
    // under the ASCII class (é/à/è counted as symbols) but not under fr.
    // Accent-dense on purpose: 17 accented chars in ~60 — above the 10%
    // symbol threshold under ASCII, zero symbols under the fr class.
    val fr = df(Seq(Row(2L, "fr",
      "le été général réalité déjà très élève ça référé même créé")),
      "doc_id BIGINT, lang STRING, text STRING")
    val frRow = graft.ext.TextAnalysis.gopherFlagsByLang(fr).head()
    assert(!frRow.getAs[Boolean]("symbol_heavy"),
      s"accented letters counted as symbols: n_symbols=${frRow.getAs[Long]("n_symbols")}")
    assert(graft.ext.TextAnalysis.gopherFlags(fr).head().getAs[Boolean]("symbol_heavy"),
      "contrast: the ASCII default must trip on the same text")
  }

  test("gopherSummaryByLang groups by the dispatch column, whatever its name") {
    import spark.implicits._
    val renamed = Queries.gopherCjkFixtures.toDF("doc_id", "language", "text")
    val s = graft.ext.TextAnalysis.gopherSummaryByLang(renamed, langCol = "language")
      .collect()
    assert(s.map(_.getAs[String]("language")).sorted.toSeq == Seq("ja", "ko", "zh"))
    assert(s.map(_.getAs[Long]("n_pass")).sum == 3L) // the three PASS fixtures
  }

  test("repetitionByLang: self-repeating docs score high, varied text zero, short docs drop") {
    import org.apache.spark.sql.Row
    val docs = df(Seq(
      // "spam spam spam spam spam" → 4 bigrams, 1 distinct → dup_frac 0.75
      Row(1L, "rep", "spam spam spam spam spam"),
      // all-distinct bigrams → dup_frac 0
      Row(2L, "var", "one two three four five"),
      // single token → no bigrams → excluded from its lang's n_docs
      Row(3L, "var", "lonely")),
      "doc_id BIGINT, lang STRING, text STRING")
    val r = TextAnalysis.repetitionByLang(docs, n = 2).collect()
      .map(x => x.getString(0) ->
        ((x.getAs[Long]("n_docs"), x.getAs[Double]("dup_frac")))).toMap
    assert(r("rep") == ((1L, 0.75)))
    assert(r("var") == ((1L, 0.0)))
  }
}
