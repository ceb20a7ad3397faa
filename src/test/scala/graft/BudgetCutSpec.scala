package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.BudgetCut

class BudgetCutSpec extends SparkSpec {

  // Quality ties across docs (the band must never split a tie), a
  // zero-token doc (empty text), a null-quality doc (dropped), and
  // token counts chosen so small budgets land crossings INSIDE bands.
  private def corpus = df(Seq(
    Row(1L, "a b c d e", 90L, "s1"),       // 5 toks
    Row(2L, "a b c", 90L, "s2"),           // 3 toks, ties q=90 with 1
    Row(3L, "", 88L, "s1"),                // 0 toks — free inside prefix
    Row(4L, "a b c d e f g h", 80L, "s2"), // 8 toks
    Row(5L, "a b", 80L, "s1"),             // 2 toks, ties q=80 with 4
    Row(6L, "a b c d", 40L, "s1"),         // 4 toks
    Row(7L, "a", null, "s2"),              // null quality — dropped
    Row(8L, "a b c d e f", 12L, "s2")      // 6 toks
  ), "doc_id BIGINT, text STRING, q BIGINT, source STRING")

  private def naive(budget: Long) =
    corpus.filter(col("q").isNotNull)
      .withColumn("tokens", graft.ext.TextAnalysis.tokenCount(col("text")))
      .withColumn("cum", sum("tokens").over(Window
        .orderBy(col("q").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select("doc_id", "tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  private def staged(budget: Long, bandWidth: Long, parts: Int) =
    BudgetCut.cut(corpus.repartition(parts), "q", budget,
        bandWidth = bandWidth)
      .select("doc_id", "tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("staged cut equals the naive global prefix for every bandWidth " +
    "and partitioning") {
    // Budgets hitting: inside the top tie pair (7), exactly a doc
    // boundary (8), mid-corpus (12, 18), past everything (999), zero.
    for (budget <- Seq(0L, 7L, 8L, 12L, 18L, 999L);
         bw <- Seq(1L, 7L, 16L, 1000L); parts <- Seq(1, 3, 8)) {
      val expected = naive(budget)
      val got = staged(budget, bw, parts)
      assert(got.sameElements(expected),
        s"budget=$budget bandWidth=$bw parts=$parts: " +
          s"got ${got.toSeq} expected ${expected.toSeq}")
    }
  }

  test("prefix-cut semantics: the crossing doc drops, later smaller " +
    "docs are NOT backfilled, zero-token docs inside the prefix stay") {
    // budget 9: doc1 (5) + doc2 (3) = 8, doc3 (0 toks) = 8 — kept;
    // doc4 (8) would cross → dropped; doc5 (2) WOULD fit but is after
    // the crossing in a prefix cut → dropped too.
    assert(staged(9L, 16L, 3).map(_._1).sameElements(Seq(1L, 2L, 3L)))
    // Sanity: the naive replay agrees (the semantics, not just parity).
    assert(naive(9L).map(_._1).sameElements(Seq(1L, 2L, 3L)))
  }

  test("null quality dropped; whole corpus fits when budget >= total") {
    val all = staged(999L, 16L, 2)
    assert(all.map(_._1).sameElements(Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L)))
    assert(all.map(_._2).sum == 28L)
  }

  test("guards: negative budget, zero bandWidth, census cap") {
    intercept[IllegalArgumentException] {
      BudgetCut.cut(corpus, "q", -1L)
    }
    intercept[IllegalArgumentException] {
      BudgetCut.cut(corpus, "q", 10L, bandWidth = 0L)
    }
  }

  test("negative qualities band in order (floor, not truncate-to-zero)") {
    val d = df(Seq(
      Row(1L, "a b", -5L, "s1"), Row(2L, "a b c", -20L, "s1"),
      Row(3L, "a", 4L, "s1")
    ), "doc_id BIGINT, text STRING, q BIGINT, source STRING")
    // Order: 3 (q=4, 1 tok), 1 (q=-5, 2), 2 (q=-20, 3). budget=3 keeps 3,1.
    val got = BudgetCut.cut(d, "q", 3L, bandWidth = 16L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Seq(1L, 3L)))
  }

  test("registered x26_budget_cut: non-trivial cut, per-source census") {
    val out = Queries.x26BudgetCut(spark, sfDir).collect()
    assert(out.nonEmpty)
    val kept = out.map(_.getLong(2)).sum
    assert(kept > 0L && kept <= 12000L, s"kept_tokens $kept")
  }

  test("cutBy with the whitespace counter equals cut; a null supplied " +
       "count fails loudly; the registered BPE cut is non-trivial") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val a = graft.ext.BudgetCut.cut(docs, "n_chars", 9000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ext.BudgetCut.cutBy(
        docs.withColumn("wt",
          graft.ext.TextAnalysis.tokenCount(col("text"))),
        "n_chars", 9000L, tokensOf = col("wt"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "cutBy(whitespace) must equal cut")
    val ex = intercept[Exception] {
      graft.ext.BudgetCut.cutBy(
        docs.withColumn("wt", when(col("doc_id") === 3L, lit(null))
          .otherwise(lit(1L))),
        "n_chars", 9000L, tokensOf = col("wt")).count()
    }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("token count") ||
        Option(ex.getCause).exists(_.getMessage.contains("token count"))),
      s"want the loud null-count error, got: ${ex.getMessage}")
    val bpe = Queries.x26BudgetBpe(spark, sfDir).collect()
    assert(bpe.nonEmpty)
    val keptTok = bpe.map(_.getLong(2)).sum
    assert(keptTok > 0L && keptTok <= 30000L, s"kept BPE tokens $keptTok")
    val keptDocs = bpe.map(_.getLong(1)).sum
    assert(keptDocs < docs.count(), "the BPE cut must be non-trivial")
  }
}
