package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.stream.StreamingClean

class StreamingCleanSpec extends SparkSpec {

  private val ddl = "doc_id BIGINT, text STRING"

  test("the chain composes in the contract order: mojibake fixes before " +
       "NFC, line dedup before the clean pass eats newlines") {
    val rows = Seq(
      // mojibake \u00e9 + markup + duplicate lines, all in one document
      Row(1L, "caf\u00c3\u00a9 <b>bold</b>\nboiler\nkeep\nboiler"),
      // decomposed NFD \u00e9 composes, then entity unescapes
      Row(2L, "cafe\u0301 &amp; more"),
      Row(3L, null),
      Row(4L, "plain text"))
    val out = StreamingClean.cleanStream(df(rows, ddl))
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(out(0) == "caf\u00e9 bold boiler keep",
      s"got: ${out(0)} \u2014 repair, tag strip, line dedup must all land")
    assert(out(1) == "caf\u00e9 & more",
      s"got: ${out(1)} \u2014 NFD must compose BEFORE any text keying")
    assert(out(2) == null)
    assert(out(3) == "plain text")
  }

  test("live micro-batched stream equals the batch projection row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq :+ (9999999L -> "caf\u00c3\u00a9 <p>x</p>\nb\nb") :+
      (9999998L -> (null: String))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer[(Long, String)]()
    val query = StreamingClean.cleanStream(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r => (r.getLong(0),
            if (r.isNullAt(1)) null else r.getString(1)))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s12-ckpt").toString)
      .start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    val batch = StreamingClean.cleanStream(
        df(docs.map(t => Row(t._1, t._2)), ddl))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(out.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq,
      "stream and batch stage-0 cleaning diverged")
    assert(out.exists(r => r._1 == 9999999L && r._2 == "caf\u00e9 x b"),
      s"the hostile plant must clean correctly in the stream")
  }
}
