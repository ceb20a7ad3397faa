package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class NestedPivotSpec extends SparkSpec {

  test("from_json under the explicit schema: corrupt JSON nulls the " +
       "struct and explode drops the row — no silent half-parse") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "meta STRUCT<author: STRING, tags: ARRAY<STRING>, score: BIGINT>")
    val rows = Seq(
      Row(1L, """{"meta":{"author":"a","tags":["x","y"],"score":5}}"""),
      Row(2L, """{"meta":{"author":"b""" /* truncated */),
      Row(3L, """{"meta":{"author":"c","tags":[],"score":1}}"""))
    val out = df(rows, "doc_id BIGINT, json STRING")
      .select(col("doc_id"), from_json(col("json"), schema).as("j"))
      .select(col("doc_id"), col("j.meta.author").as("author"),
        explode(col("j.meta.tags")).as("tag"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    // Only doc 1's two tags survive: corrupt doc 2 parses to null
    // (explode drops), doc 3's empty array explodes to nothing.
    assert(out.toSeq == Seq((1L, "x"), (1L, "y")),
      s"got:\n${out.mkString("\n")}")
  }

  test("registered pivot: explicit columns, zero-filled cells, row " +
       "sums equal the day totals") {
    val out = Queries.x51PivotCrosstab(spark, sfDir)
    assert(out.columns.toSeq ==
      Seq("dt", "view", "click", "purchase", "signup", "error"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val pivotTotal = rows.map(r =>
      (1 to 5).map(i => r.getLong(i)).sum).sum
    assert(pivotTotal == Tables.events(spark, sfDir).count(),
      "pivot cells must partition the event count exactly")
  }

  test("registered flatten: tag duplicates count twice (explode " +
       "semantics) and the census partitions 2x the doc count") {
    val out = Queries.x50NestedFlatten(spark, sfDir).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == 2L * Tables.documents(spark, sfDir).count(),
      "every document must contribute exactly its two tag slots")
  }
}
