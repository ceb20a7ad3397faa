package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.stream.StreamingIngest

class StreamingIngestSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "meta STRUCT<author: STRING, tags: ARRAY<STRING>, score: BIGINT>")

  private def flatten(d: org.apache.spark.sql.DataFrame) =
    StreamingIngest.flattenStream(d, "json", schema,
      paths = Seq("meta.author", "meta.score"),
      arrayPath = "meta.tags", elemName = "tag")

  test("corrupt and tagless records drop; good records flatten to one " +
       "row per tag with the leaf-named columns") {
    val rows = Seq(
      Row(1L, """{"meta":{"author":"a","tags":["x","y"],"score":5}}"""),
      Row(2L, """{"meta":{"author":"b"""),
      Row(3L, """{"meta":{"author":"c","tags":[],"score":1}}"""),
      Row(4L, null))
    val out = flatten(df(rows, "doc_id BIGINT, json STRING"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("author"), r.getAs[String]("tag"),
        r.getAs[Long]("score")))
    assert(out.toSeq == Seq((1L, "a", "x", 5L), (1L, "a", "y", 5L)),
      s"got:\n${out.mkString("\n")}")
  }

  test("live micro-batched stream flattens identically to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Queries.x50PlantForSpec(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq :+
      (9999999L -> """{"meta":{"author":"z","tags":["q"],"score":7}}""") :+
      (9999998L -> "not json")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer[(Long, String, String)]()
    val query = flatten(input.toDF().toDF("doc_id", "json"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r => (r.getAs[Long]("doc_id"),
            r.getAs[String]("author"), r.getAs[String]("tag")))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s15-ckpt").toString)
      .start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    val batch = flatten(df(docs.map(t => Row(t._1, t._2)),
        "doc_id BIGINT, json STRING"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("author"), r.getAs[String]("tag")))
    assert(out.sorted.toSeq == batch.sorted.toSeq,
      "stream and batch flatten diverged")
    assert(out.exists(_._1 == 9999999L) && !out.exists(_._1 == 9999998L))
  }
}
