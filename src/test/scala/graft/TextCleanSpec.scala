package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.TextClean

class TextCleanSpec extends SparkSpec {

  private def cleanOne(s: String): String = {
    val d = df(Seq(Row(1L, s)), "doc_id BIGINT, text STRING")
    TextClean.clean(d).select("clean_text").first().getString(0)
  }

  test("script and style elements vanish wholesale, content included") {
    assert(cleanOne("a <script>var x = 1 < 2;</script> b") == "a b")
    assert(cleanOne("a <style>p{color:red}</style> b") == "a b")
    assert(cleanOne("a <SCRIPT TYPE=\"x\">multi\nline</script > b") == "a b")
    // Reluctant body: two elements don't merge and eat the text between.
    assert(cleanOne("a <script>x</script> keep <script>y</script> b")
      == "a keep b")
  }

  test("tags strip to a space so adjacent text never fuses") {
    assert(cleanOne("one</p><p>two") == "one two")
    assert(cleanOne("<div class='x'>padded</div>") == "padded")
  }

  test("entities unescape once, single-pass (&amp;amp; stays displayed)") {
    assert(cleanOne("A &lt;b&gt; &quot;c&quot; &apos;d&#39; &nbsp;E")
      == "A <b> \"c\" 'd' E")
    // The classic sanitizer bug: double-escaped text must NOT decode twice.
    assert(cleanOne("x &amp;amp; y") == "x &amp; y")
    assert(cleanOne("x &amp; y") == "x & y")
    // Escaped markup is displayed text, not markup: it survives the strip.
    assert(cleanOne("&lt;script&gt;not code&lt;/script&gt;")
      == "<script>not code</script>")
  }

  test("whitespace collapses; null stays null with false/0 audit columns") {
    assert(cleanOne("  a\n\n\tb   c  ") == "a b c")
    val d = df(Seq(Row(1L, null)), "doc_id BIGINT, text STRING")
    val r = TextClean.clean(d).first()
    assert(r.getAs[String]("clean_text") == null)
    assert(!r.getAs[Boolean]("had_markup"))
    assert(r.getAs[Long]("n_tok_clean") == 0L)
  }

  test("dedupLines keeps first occurrences in order; exact-byte identity") {
    def run(s: String): org.apache.spark.sql.Row =
      TextClean.dedupLinesAudit(
        df(Seq(Row(1L, s)), "doc_id BIGINT, text STRING")).first()
    val r = run("a\nb\na\nc\nb\na")
    assert(r.getAs[String]("line_deduped") == "a\nb\nc")
    assert(r.getAs[Long]("n_lines_in") == 6L &&
      r.getAs[Long]("n_lines_out") == 3L &&
      r.getAs[Boolean]("had_dup_lines"))
    // No newline: unchanged, not flagged.
    val one = run("just one line")
    assert(one.getAs[String]("line_deduped") == "just one line" &&
      !one.getAs[Boolean]("had_dup_lines"))
    // Exact bytes: case/trim variants are DIFFERENT lines (cleanText's
    // job runs before this one).
    assert(run("a\nA\na ").getAs[String]("line_deduped") == "a\nA\na ")
    // Trailing/interior empty lines dedup like any other line.
    assert(run("a\n\nb\n\n").getAs[String]("line_deduped") == "a\n\nb")
    // Null in, null out.
    val n = TextClean.dedupLinesAudit(
      df(Seq(Row(1L, null)), "doc_id BIGINT, text STRING")).first()
    assert(n.getAs[String]("line_deduped") == null)
  }

  test("registered x19 lanes: planted markup flags, clean lane may not") {
    val out = Queries.x19TextClean(spark, sfDir).collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    // Every planted lane (doc_id % 5 in 0..2, non-null text) must flag.
    val planted = out.filter(r => r.getLong(0) % 5 <= 2)
    assert(planted.nonEmpty && planted.forall(_.getAs[Boolean]("had_markup")))
  }

  private def xdocRows(texts: (Long, String)*) = df(
    texts.map { case (id, t) => Row(id, t) },
    "doc_id BIGINT, text STRING")

  private def xdocMap(d: org.apache.spark.sql.DataFrame, minDf: Long) =
    TextClean.dedupLinesAcross(d, minDf)
      .select("doc_id", "text_xdedup", "n_boiler_dropped", "had_boilerplate")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap

  test("dedupLinesAcross drops cross-doc boilerplate, keeps order + rare lines") {
    val d = xdocRows(
      1L -> "intro one\nsubscribe now\nbody one",
      2L -> "subscribe now\nbody two",
      3L -> "body three\nsubscribe now",
      4L -> "pair line\nbody four",
      5L -> "body five\npair line")
    val out = xdocMap(d, 3L)
    // df=3 footer drops everywhere, in-order reassembly of the rest.
    assert(out(1L) == (("intro one\nbody one", 1L, true)))
    assert(out(2L) == (("body two", 1L, true)))
    assert(out(3L) == (("body three", 1L, true)))
    // df=2 survives at minDocFreq=3 — the threshold is a boundary, not
    // a suggestion.
    assert(out(4L) == (("pair line\nbody four", 0L, false)))
    assert(out(5L) == (("body five\npair line", 0L, false)))
    // ...and drops at minDocFreq=2.
    val strict = xdocMap(d, 2L)
    assert(strict(4L) == (("body four", 1L, true)))
  }

  test("dedupLinesAcross: doc frequency, not occurrences; norm identity; blanks exempt") {
    val d = xdocRows(
      // One doc repeating its own line 4x: df=1, must NOT drop (that is
      // within-doc dedupLines' job).
      1L -> "mine\nmine\nmine\nmine",
      // Norm identity: case/spacing variants are the SAME boilerplate.
      2L -> "Subscribe   NOW \nkeep two",
      3L -> "subscribe now\nkeep three",
      4L -> " SUBSCRIBE\tnow\nkeep four",
      // Blank lines: df = every doc, but whitespace-only norms are
      // exempt — structure survives.
      5L -> "a\n\nb",
      6L -> "c\n\nd",
      7L -> "e\n\nf")
    val out = xdocMap(d, 3L)
    assert(out(1L) == (("mine\nmine\nmine\nmine", 0L, false)))
    assert(out(2L) == (("keep two", 1L, true)))
    assert(out(3L) == (("keep three", 1L, true)))
    assert(out(4L) == (("keep four", 1L, true)))
    assert(out(5L) == (("a\n\nb", 0L, false)))
    // A doc losing EVERY line comes back as '' and is counted whole.
    val all = xdocRows(
      1L -> "gone", 2L -> "gone", 3L -> "gone", 4L -> "gone\nstays")
    val wiped = xdocMap(all, 3L)
    assert(wiped(1L) == (("", 1L, true)))
    assert(wiped(4L) == (("stays", 1L, true)))
    // Null text: no lines to drop, comes back as '' ('' split = one
    // empty line, whose norm is exempt) — flagged false.
    val n = xdocMap(xdocRows(1L -> null, 2L -> "x", 3L -> "y"), 3L)
    assert(n(1L)._2 == 0L && !n(1L)._3)
  }

  test("dedupLinesAcross with a paragraph separator (the CCNet unit)") {
    // sep = "\n\n": the multi-LINE paragraph is the dedup unit — the
    // shared footer paragraph (which itself contains a newline) drops
    // whole, and single newlines inside surviving paragraphs survive.
    val d = xdocRows(
      1L -> "para one keeps\nits inner line\n\nshared footer para\nsecond line",
      2L -> "unique two\n\nshared footer para\nsecond line",
      3L -> "unique three\n\nshared footer para\nsecond line")
    val out = TextClean.dedupLinesAcross(d, 3L, sep = "\n\n")
      .select("doc_id", "text_xdedup", "n_boiler_dropped").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("para one keeps\nits inner line", 1L)))
    assert(out(2L) == (("unique two", 1L)))
    // And the separator is LITERAL, not a regex: a "." separator must
    // not split on every character.
    val dotted = TextClean.dedupLinesAcross(
      xdocRows(1L -> "a b.c d", 2L -> "x.c d", 3L -> "y.c d"), 3L, sep = ".")
      .select("doc_id", "text_xdedup").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dotted(1L) == "a b")
  }

  test("dedupLinesAcross is partitioning-invariant and census-consistent") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .withColumn("text", concat(coalesce(col("text"), lit("")),
        lit("\nglobal footer line")))
    val a = TextClean.dedupLinesAcross(docs, 3L)
      .select("doc_id", "text_xdedup", "n_boiler_dropped").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val b = TextClean.dedupLinesAcross(docs.repartition(13), 3L)
      .select("doc_id", "text_xdedup", "n_boiler_dropped").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
    // The planted universal footer is in the census and every doc lost
    // at least that one line.
    val census = TextClean.boilerplateLines(docs, 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census("global footer line") == docs.count())
    assert(a.forall(_._3 >= 1L))
  }
}
