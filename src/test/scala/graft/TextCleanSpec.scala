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
}
