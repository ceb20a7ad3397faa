package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.CorpusDiff

class CorpusDiffSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = df(
    rows.map { case (id, t) => Row(id, t) }, "doc_id BIGINT, text STRING")

  test("diff: all four statuses, null-text discipline") {
    val old = corpus(1L -> "same", 2L -> "will change", 3L -> "will go",
      4L -> null, 5L -> null)
    val neu = corpus(1L -> "same", 2L -> "changed", 6L -> "brand new",
      4L -> null, 5L -> "was null")
    val got = CorpusDiff.diff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "modified", 3L -> "removed",
      // null == null is unchanged; null -> text is modified — the
      // coalesce fingerprint, not three-valued-logic surprises.
      4L -> "unchanged", 5L -> "modified", 6L -> "added"))
    val sum = CorpusDiff.summary(old, neu).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sum == Map(
      "added" -> ((1L, 6L)), "modified" -> ((2L, 7L)),
      "removed" -> ((1L, 3L)), "unchanged" -> ((2L, 5L))))
  }

  test("registered x25_corpus_diff: all statuses occur with the planted shape") {
    val rows = Queries.x25CorpusDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.keySet == Set("added", "modified", "removed", "unchanged"))
    assert(rows("added") == 20L)
    // removed = every 17th id present in the corpus; modified = every
    // 13th-but-not-17th; the rest unchanged. Statuses partition
    // old ∪ added exactly.
    assert(rows.values.sum == n + 20L)
    assert(rows("unchanged") > rows("modified"))
  }
}
