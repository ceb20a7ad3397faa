package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.C4

class C4Spec extends SparkSpec {

  private def flagsOf(texts: (Long, String)*) =
    C4.c4Flags(df(texts.map { case (id, t) => Row(id, t) },
        "doc_id BIGINT, text STRING"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("line retention: terminal punct, five-word floor, javascript — each a boundary") {
    val out = flagsOf(
      1L -> ("keep this line of prose.\n" + // 5 words, period
        "four word line here.\n" +          // 4 words — drops
        "ends with a question mark?\n" +    // keeps
        "ends with end quote words”\n" +    // keeps (” terminal)
        "no terminal punctuation at all\n" + // drops
        "the JavaScript rule is case insensitive.\n" + // drops
        "trailing whitespace still counts fine. \t"))   // keeps (strip first)
    val r = out(1L)
    assert(r.getAs[String]("c4_text") ==
      "keep this line of prose.\n" +
      "ends with a question mark?\n" +
      "ends with end quote words”\n" +
      "trailing whitespace still counts fine. \t")
    assert(r.getAs[Long]("c4_lines_in") == 7L)
    assert(r.getAs[Long]("c4_lines_kept") == 4L)
  }

  test("page gates: brace and blocked phrase on ORIGINAL text, 3-sentence floor on retained") {
    val prose =
      "this is the first good sentence.\nthis is the second good sentence.\n"
    val out = flagsOf(
      1L -> (prose + "this is the third good sentence."), // 3 sentences: pass
      2L -> prose,                                        // 2 sentences: fail
      // The brace is on a DROPPED line — the page still fails (C4
      // discards brace pages outright; the line filter cannot rescue).
      3L -> (prose + "this is the third good sentence.\ncode { here"),
      4L -> (prose + "this is the third good sentence.\nLOREM IPSUM filler"),
      5L -> null)
    assert(out(1L).getAs[Boolean]("c4_pass"))
    assert(!out(2L).getAs[Boolean]("c4_pass") &&
      out(2L).getAs[Long]("c4_sentences") == 2L)
    assert(!out(3L).getAs[Boolean]("c4_pass") &&
      out(3L).getAs[Boolean]("c4_has_brace"))
    assert(!out(4L).getAs[Boolean]("c4_pass") &&
      out(4L).getAs[Boolean]("c4_blocked"))
    // Null text: empty rewrite, zero counts, fails the gate quietly.
    assert(!out(5L).getAs[Boolean]("c4_pass") &&
      out(5L).getAs[String]("c4_text") == "" &&
      out(5L).getAs[Long]("c4_lines_kept") == 0L)
  }

  test("sentence floor counts terminal marks in the RETAINED text only") {
    // Three sentences on ONE retained line pass; three sentences spread
    // over lines that individually fail retention do not.
    val out = flagsOf(
      1L -> "one good sentence here now. and then another one follows! is this the third?",
      2L -> "short one.\nshort two.\nshort three.")
    assert(out(1L).getAs[Boolean]("c4_pass") &&
      out(1L).getAs[Long]("c4_sentences") == 3L)
    assert(!out(2L).getAs[Boolean]("c4_pass") &&
      out(2L).getAs[Long]("c4_lines_kept") == 0L)
  }

  test("c4Filter ships the rewrite: gated pages only, text replaced, flags dropped") {
    val d = df(Seq(
      Row(1L, "this is the first good sentence.\nthis is the second good sentence.\ndrop me\nthis is the third good sentence."),
      Row(2L, "too { short.")), "doc_id BIGINT, text STRING")
    val out = C4.c4Filter(d).collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[String]("text") ==
      "this is the first good sentence.\nthis is the second good sentence.\nthis is the third good sentence.")
    assert(!out.head.schema.fieldNames.exists(_.startsWith("c4_")))
  }

  test("registered x3_c4_rules: plants land in every source, gates fire both ways") {
    val rows = Queries.x3C4Rules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, pass) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"))
      assert(pass >= 0L && pass <= docs)
      // The footer adds 4 lines to every doc, so lines_in > docs * 4.
      assert(r.getAs[Long]("lines_in") > 4L * docs)
      // At least the planted prose line is retained per doc.
      assert(r.getAs[Long]("lines_kept") >= docs)
    }
  }
}
