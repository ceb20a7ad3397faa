package graft

import org.apache.spark.sql.Row

import graft.ext.DatasetCard

class DatasetCardSpec extends SparkSpec {

  private val ddl = "doc_id BIGINT, text STRING, lang STRING, source STRING"

  test("small fixture: dup families by normText, blanks in the '' " +
       "family, exact interpolated median, pii incidence") {
    val rows = Seq(
      // source a: two copies (whitespace-variant → same norm), one
      // unique, one blank → 4 docs, 3 distinct ('' family + 2), dup 25%.
      Row(1L, "Hello  World", "en", "a"),
      Row(2L, "hello world", "en", "a"),
      Row(3L, "unique text here", "en", "a"),
      Row(4L, null, "de", "a"),
      // source b: one doc with an email → pii.
      Row(5L, "mail me at x@y.com now", "en", "b"))
    val out = DatasetCard.card(df(rows, ddl)).collect()
      .map(r => r.getAs[String]("source") -> r).toMap

    val a = out("a")
    assert(a.getAs[Long]("n_docs") == 4L)
    assert(a.getAs[Long]("n_empty") == 1L)
    assert(a.getAs[Long]("n_distinct_text") == 3L)
    assert(a.getAs[Long]("dup_ppm") == 250000L)
    assert(a.getAs[Long]("n_langs") == 2L)
    assert(a.getAs[Long]("docs_with_pii") == 0L)
    // token counts 2, 2, 3, 0 → sorted (0,2,2,3), median = 2.0.
    assert(a.getAs[Double]("p50_tok") == 2.0)

    val b = out("b")
    assert(b.getAs[Long]("docs_with_pii") == 1L)
    assert(b.getAs[Long]("n_tokens") == 5L)

    val all = out("(all)")
    assert(all.getAs[Long]("grouping_level") == 1L)
    assert(all.getAs[Long]("n_docs") == 5L)
    // cross-source distinct: a's 3 families + b's 1 = 4.
    assert(all.getAs[Long]("n_distinct_text") == 4L)
  }

  test("additive columns fold: the total row equals the sum of the " +
       "per-source rows on the documents table") {
    val rows = DatasetCard.card(Tables.documents(spark, sfDir)).collect()
    val (all, per) = rows.partition(_.getAs[Long]("grouping_level") == 1L)
    assert(all.length == 1 && per.nonEmpty)
    for (c <- Seq("n_docs", "n_tokens", "n_chars", "n_empty",
        "docs_with_pii")) {
      assert(all.head.getAs[Long](c) == per.map(_.getAs[Long](c)).sum,
        s"$c does not fold")
    }
    // Distinct text is SUB-additive (cross-source duplicates collapse).
    assert(all.head.getAs[Long]("n_distinct_text") <=
      per.map(_.getAs[Long]("n_distinct_text")).sum)
  }
}
