package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.stream.StreamingRedact

class StreamingRedactSpec extends SparkSpec {

  private val ddl = "doc_id BIGINT, text STRING"

  test("one projection scrubs valid cards, emails, phones, and IPs; " +
       "Luhn-invalid candidates and plain digits survive untouched") {
    val rows = Seq(
      Row(1L, "pay 4111111111111111 or 4539 5787 6362 1486 now"),
      Row(2L, "order 4111111111111112 ref 1234567890123 end"),
      Row(3L, "mail a.b+c@example.com call 555-867-5309 at 10.0.0.7"),
      Row(4L, "clean text with no pii at all"),
      Row(5L, null))
    def i(r: Row, f: String): Int = {
      val idx = r.fieldIndex(f)
      if (r.isNullAt(idx)) -1 else r.getInt(idx) // null audit counts → -1
    }
    val out = StreamingRedact.scrubStream(df(rows, ddl))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(r.fieldIndex("text"))) null
        else r.getString(r.fieldIndex("text")),
        i(r, "n_card_valid"), i(r, "n_email"), i(r, "n_phone"),
        i(r, "n_ipv4")))
    assert(out(0) == ((1L, "pay <CARD> or <CARD> now", 2, 0, 0, 0)))
    assert(out(1) == ((2L, "order 4111111111111112 ref 1234567890123 end",
      0, 0, 0, 0)), "Luhn-invalid candidates must survive byte-for-byte")
    assert(out(2) == ((3L, "mail <EMAIL> call <PHONE> at <IPV4>", 0, 1, 1, 1)))
    assert(out(3) == ((4L, "clean text with no pii at all", 0, 0, 0, 0)))
    assert(out(4)._2 == null, "null text null-propagates")
  }

  test("live micro-batched stream equals the batch projection row for row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer[(Long, String, Int)]()
    val query = StreamingRedact.scrubStream(
        input.toDF().toDF("doc_id", "text"))
      .select("doc_id", "text", "n_card_valid")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r => (r.getLong(0),
            if (r.isNullAt(1)) null else r.getString(1),
            if (r.isNullAt(2)) -1 else r.getInt(2)))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s11-ckpt").toString)
      .start()
    try {
      val withCard = docs :+
        (9999999L -> "urgent pay 4111111111111111 today") :+
        (9999998L -> (null: String))
      val (a, b) = withCard.splitAt(withCard.length / 2)
      input.addData(a.toSeq); query.processAllAvailable()
      input.addData(b.toSeq); query.processAllAvailable()
    } finally query.stop()
    val batchRows = StreamingRedact.scrubStream(
        df(docs.map(t => Row(t._1, t._2)) :+
          Row(9999999L, "urgent pay 4111111111111111 today") :+
          Row(9999998L, null), ddl))
      .select("doc_id", "text", "n_card_valid")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(out.sortBy(_._1).toSeq == batchRows.sortBy(_._1).toSeq,
      "stream and batch scrub outputs diverged")
    assert(out.exists(r => r._1 == 9999999L && r._2.contains("<CARD>")),
      "the planted card must be redacted in the stream")
  }
}
