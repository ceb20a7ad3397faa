package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The fused multi-size census must be bit-identical to the per-size
  * [[graft.functions.NGramStats]] it replaced in gopherCore — same
  * quadruple [n_grams, distinct, top-gram chars, dup-gram char mass]
  * per size, for every size in the range. The fused path computes gram
  * char lengths ARITHMETICALLY (token char prefix sums + separator
  * spaces) and grams as zero-copy byte views, so the parity cases pin
  * exactly the places where that arithmetic could diverge from the
  * per-gram numChars walk: multibyte tokens, empty tokens, and
  * repeated grams of different byte/char widths. */
class NGramStatsMultiSpec extends SparkSpec {

  private val minN = 2
  private val maxN = 10

  private def parityCheck(tokenLists: Seq[Seq[String]]): Unit = {
    val rows = tokenLists.map(ts => Row(ts))
    val d = df(rows, "toks ARRAY<STRING>")
    val multi = TextFunctions.ngramStatsMulti(col("toks"), minN, maxN)
    val singles = (minN to maxN).map(n => TextFunctions.ngramStats(col("toks"), n))
    val out = d.select(
      multi.as("m") +: singles.zipWithIndex.map { case (c, i) => c.as(s"g$i") }: _*)
      .collect()
    out.zip(tokenLists).foreach { case (r, toks) =>
      val m = r.getSeq[Long](0)
      assert(m.length == 4 * (maxN - minN + 1))
      (minN to maxN).zipWithIndex.foreach { case (n, i) =>
        val single = r.getSeq[Long](1 + i)
        val quad = m.slice(4 * i, 4 * i + 4)
        assert(quad == single,
          s"size $n mismatch for tokens $toks: fused $quad vs single $single")
      }
    }
  }

  test("fused census matches per-size NGramStats on ASCII, repeats, boilerplate") {
    parityCheck(Seq(
      "the quick brown fox jumps over the lazy dog".split(" ").toSeq,
      // Heavy repetition: the same 5-gram phrase three times.
      Seq.fill(3)("click here to buy now".split(" ").toSeq).flatten,
      // Alternating bigram repetition (top-gram coverage ties).
      Seq("a", "b", "a", "b", "a", "b", "a", "b"),
      // All-identical tokens: every gram of every size duplicated.
      Seq.fill(12)("x"),
      ('a' to 'z').map(_.toString)))
  }

  test("fused census matches per-size NGramStats on multibyte and empty tokens") {
    parityCheck(Seq(
      // CJK: 3-byte chars — byte offsets and char counts diverge.
      Seq("这是", "一个", "测试", "这是", "一个", "测试", "句子"),
      // Mixed widths incl. 2-byte accents and 4-byte emoji.
      Seq("café", "naïve", "😀", "café", "naïve", "😀"),
      // Empty tokens: grams still join with spaces around zero bytes.
      Seq("", "a", "", "a", "", "b"),
      Seq("", "", "", ""),
      // Tie on count where gram char lengths differ (longest must win).
      Seq("aa", "b", "aa", "b", "cccc", "d", "cccc", "d")))
  }

  test("fused census: sizes beyond the token count are all-zero quadruples") {
    parityCheck(Seq(
      Seq("only", "three", "tokens"), // sizes 4..10 zero
      Seq("one"),                     // every size zero (m < minN)
      Seq.empty[String]))
  }

  test("null token array yields null (UnaryExpression null propagation)") {
    val d = df(Seq(Row(null)), "toks ARRAY<STRING>")
    val r = d.select(TextFunctions.ngramStatsMulti(col("toks"), 2, 4)).collect()
    assert(r.head.isNullAt(0))
  }
}
