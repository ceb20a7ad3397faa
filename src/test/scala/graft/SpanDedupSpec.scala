package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.SpanDedup

class SpanDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    df(rows.map { case (id, t) => Row(id, t) }, "doc_id BIGINT, text STRING")

  // Width-2 token blocks make fixtures readable: "a b c d" -> ["a b", "c d"].

  test("tokenSpans chunks the normalized token stream into fixed blocks") {
    val spans = SpanDedup.tokenSpans(docs((1L, "A  b C d e")), width = 2)
      .orderBy("pos").collect().map(r => (r.getInt(1), r.getString(2)))
    assert(spans.toSeq == Seq((0, "a b"), (1, "c d"), (2, "e")))
  }

  test("duplicated span kept only at its first (doc, pos) occurrence") {
    val d = docs(
      (1L, "x y common block p q"),
      (2L, "common block r s"),
      (3L, "t u common block"))
    val out = SpanDedup.dedupTokenSpans(d, width = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "common block" occurs at (1,1), (2,0), (3,1); first is (1,1).
    assert(out(0) == ((1L, 3L, 0L, "x y common block p q")))
    assert(out(1) == ((2L, 2L, 1L, "r s")))
    assert(out(2) == ((3L, 2L, 1L, "t u")))
  }

  test("within-doc repeats are deduped too; unique spans untouched") {
    val d = docs((1L, "a b a b c d"))
    val out = SpanDedup.dedupTokenSpans(d, width = 2).collect().head
    assert(out.getAs[Long]("n_dropped") == 1L)
    assert(out.getAs[String]("text") == "a b c d")
  }

  test("a document can lose every span and survives with empty text") {
    val d = docs((1L, "a b"), (2L, "a b"), (3L, "a b"))
    val out = SpanDedup.dedupTokenSpans(d, width = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text")).toSeq == Seq("a b", "", ""))
    assert(out.map(_.getAs[Long]("n_dropped")).toSeq == Seq(0L, 1L, 1L))
  }

  test("line mode: normalized identity collides, original text is kept") {
    val d = docs(
      (1L, "Home | About\nunique one"),
      (2L, "home   | about\nunique two"))
    val out = SpanDedup.dedupLines(d).orderBy("doc_id").collect()
    // Doc 1's line survives with ORIGINAL casing/spacing; doc 2's copy drops.
    assert(out(0).getAs[String]("text") == "Home | About\nunique one")
    assert(out(1).getAs[String]("text") == "unique two")
  }

  test("blank lines always survive (structure, not content)") {
    val d = docs((1L, "para one\n\npara two"), (2L, "other\n\nlines"))
    val out = SpanDedup.dedupLines(d).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "para one\n\npara two")
    assert(out(1).getAs[String]("text") == "other\n\nlines")
  }

  test("rebuild restores position order regardless of partitioning") {
    val text = (0 until 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L, text)).repartition(7)
    val out = SpanDedup.dedupTokenSpans(d, width = 3).collect().head
    assert(out.getAs[String]("text") == text)
    assert(out.getAs[Long]("n_spans") == 14L)
  }

  test("null-text documents survive with empty text (annotate, don't drop)") {
    val d = df(Seq(Row(1L, "a b"), Row(2L, null)), "doc_id BIGINT, text STRING")
    val tok = SpanDedup.dedupTokenSpans(d, width = 2).orderBy("doc_id").collect()
    assert(tok.map(_.getLong(0)).toSeq == Seq(1L, 2L), "no row loss")
    assert(tok(1).getAs[String]("text") == "")
    val ln = SpanDedup.dedupLines(d).orderBy("doc_id").collect()
    assert(ln.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("minCount below 2 is rejected") {
    intercept[IllegalArgumentException] {
      SpanDedup.flagSpans(SpanDedup.tokenSpans(docs((1L, "a b"))), minCount = 1)
    }
  }

  test("substring dedup catches cross-boundary repeats that block mode misses") {
    // The same 6-token phrase sits at offset 0 in doc 1 and offset 1 in
    // doc 2 (one leading pad token): width-3 BLOCKS hash it as
    // [one two three][four five six] vs [pad one two][three four five]…
    // — no block repeats, block mode drops nothing. Stride-1 3-token
    // windows share 4 exact windows at any alignment, so the substring
    // mode drops doc 2's whole phrase and keeps doc 1's (first
    // occurrence) intact.
    val d = docs(
      (1L, "one two three four five six tail1 end1 extra1"),
      (2L, "pad one two three four five six tail2 end2"))
    val block = SpanDedup.dedupTokenSpans(d, width = 3)
    assert(block.agg(sum(col("n_dropped"))).head().getLong(0) == 0L,
      "fixture must be invisible to block mode for the contrast to mean anything")
    val sub = SpanDedup.dedupSubstrings(d, width = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dropped"), r.getAs[String]("text"))).toMap
    assert(sub(1L) == (0L, "one two three four five six tail1 end1 extra1"),
      "first occurrence keeps every token")
    assert(sub(2L)._2 == "pad tail2 end2", s"got ${sub(2L)}")
    assert(sub(2L)._1 == 6L)
  }

  test("substring dedup: sub-width repeats and within-doc repeats behave") {
    // "alpha beta" (2 tokens < width 3) repeats across docs — below the
    // minimum match length, untouched. Doc 3 repeats its own 3-token
    // phrase internally: the second occurrence drops (min (doc, pos)
    // wins WITHIN a document too).
    val d = docs(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta zeta eta theta"),
      (3L, "red green blue filler1 filler2 red green blue"))
    val sub = SpanDedup.dedupSubstrings(d, width = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dropped"), r.getAs[String]("text"))).toMap
    assert(sub(1L)._1 == 0L && sub(2L)._1 == 0L,
      "sub-width repeats are below the match length")
    assert(sub(3L) == (3L, "red green blue filler1 filler2"))
    // Null text survives empty; width/minCount validate loudly.
    val n = SpanDedup.dedupSubstrings(docs((9L, null)), width = 3).head()
    assert(n.getAs[String]("text") == "")
    intercept[IllegalArgumentException](SpanDedup.dedupSubstrings(d, width = 1))
    intercept[IllegalArgumentException](SpanDedup.dedupSubstrings(d, minCount = 1))
  }

  test("registered query drops the known duplicate blocks at sf0.001") {
    val out = Queries.x1SpanDedup(spark, sfDir)
    val agg = out.agg(sum("n_spans"), sum("n_dropped")).head()
    val total = agg.getLong(0); val dropped = agg.getLong(1)
    assert(total > 0 && dropped > 0, s"expected drops at sf0.001: $agg")
    assert(dropped < total / 2, "span dedup should not gut the corpus")
    // Dropping is idempotent: re-running on the rewritten docs drops nothing.
    val rewritten = SpanDedup.dedupTokenSpans(
      Tables.documents(spark, sfDir), width = 8, minCount = 2)
      .select(col("doc_id"), col("text"))
    val again = SpanDedup.dedupTokenSpans(rewritten, width = 8, minCount = 2)
    assert(again.agg(sum("n_dropped")).head().getLong(0) == 0L)
  }
}
