package graft

/** s25 — the streaming BPE token meter: per-document projection equals
  * the batch vocab-table serving counts row-for-row, and the live
  * MemoryStream emission matches the batch replay. */
class StreamingBpeSpec extends SparkSpec {

  test("the stateless projection equals x53_bpe_count row-for-row " +
       "(two serving shapes, one greedy fuse)") {
    val a = Queries.s25StreamBpe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Queries.x53BpeCount(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a.nonEmpty && a == b,
      s"serving shapes diverged: ${a.size} vs ${b.size} rows")
  }

  test("live two-batch MemoryStream equals the batch replay " +
       "(stateless projection — no state store, no watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val merges = graft.ext.BpeTrain
      .loadMerges(spark, Queries.bpeMergesDir(spark, sfDir))
      .orderBy("step").collect()
      .map(r => r.getAs[String]("left") -> r.getAs[String]("right")).toSeq
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batch = Queries.s25StreamBpe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    val query = graft.stream.StreamingBpe.tokenCounts(
        input.toDF().toDF("doc_id", "text"), merges)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = b.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)))
        out.synchronized { out ++= s; () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s25-ckpt").toString)
      .start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    assert(out.toSet === batch, "stream and batch counts diverged")
  }
}
