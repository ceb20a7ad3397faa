package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.stream.StreamingDecontam

class StreamingDecontamSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def savedIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("s10_bench").toString
    Dedup.saveBenchShingles(
      docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("bench_id"), col("text")),
      dir, n = 4)
    dir
  }

  test("drop set equals the batch detector's contaminated-doc set " +
       "(per-row gram set ≡ the shingle explode, hash for hash)") {
    val dir = savedIndex()
    val bench = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("bench_id"), col("text"))
    val survivors = StreamingDecontam.contamDropStreamAgainst(
        docs, StreamingDecontam.benchGramSets(spark, dir))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = Dedup.contaminationPairs(docs, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- contaminated,
      "stream survivors must be the exact complement of the batch drop set")
    // The gate bites: the benchmark docs contain 100% of themselves.
    assert(contaminated.nonEmpty && Set(0L, 1L, 2L).subsetOf(contaminated))
  }

  test("live micro-batched stream equals the batch replay; null/short " +
       "docs always survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = savedIndex()
    val bench = StreamingDecontam.benchGramSets(spark, dir)
      .localCheckpoint(true) // static side pinned for the stream plan
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer[Long]()
    val query = StreamingDecontam.contamDropStreamAgainst(
        input.toDF().toDF("doc_id", "text"), bench)
      .select("doc_id")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getLong(0)); () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s10-ckpt").toString)
      .start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a.toSeq :+ (9999999L -> null)
        :+ (9999998L -> "too short")); query.processAllAvailable()
      input.addData(b.toSeq); query.processAllAvailable()
    } finally query.stop()
    val batch = Queries.s10StreamDecontam(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(out.toSet == batch ++ Set(9999999L, 9999998L),
      "stream and batch decontamination verdicts diverged " +
        "(null/short plants must survive)")
  }
}
