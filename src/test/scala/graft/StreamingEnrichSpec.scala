package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.AsofJoin
import graft.stream.StreamingEnrich

class StreamingEnrichSpec extends SparkSpec {

  private def sec(s: Long): Timestamp = new Timestamp(s * 1000L)

  private val dimDdl =
    "user_id BIGINT, tier STRING, valid_from TIMESTAMP, valid_to TIMESTAMP"
  private val dim = Seq(
    Row(1L, "bronze", sec(10), sec(20)),
    Row(1L, "silver", sec(20), sec(30)),
    Row(1L, "gold", sec(30), null),
    Row(2L, "bronze", sec(10), sec(20)),
    Row(2L, "gold", sec(35), null))
  private val facts = Seq(
    Row(1L, 1L, sec(20)), Row(2L, 1L, sec(29)), Row(3L, 1L, sec(99)),
    Row(4L, 2L, sec(25)), Row(5L, 2L, sec(99)), Row(6L, 9L, sec(25)),
    Row(7L, 1L, sec(5)))
  private val factDdl = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"

  test("the stream-static validity join equals the batch asof " +
       "formulation row for row (gaps, unknown keys, boundaries)") {
    val d = df(dim, dimDdl)
    val f = df(facts, factDdl)
    def norm(r: org.apache.spark.sql.DataFrame) =
      r.select("event_id", "user_id", "dim_tier", "dim_valid_from")
        .collect().map(_.toSeq).toSet
    assert(norm(StreamingEnrich.enrichStream(f, d, "user_id", "ts",
        Seq("tier"))) ==
      norm(AsofJoin.enrichAsOf(f, d, "user_id", "ts", Seq("tier"))),
      "serve-time join and batch asof must agree")
  }

  test("live micro-batched stream enriches identically to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = df(dim, dimDdl)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Timestamp)]
    val out = scala.collection.mutable.Buffer[(Long, String)]()
    val query = StreamingEnrich.enrichStream(
        input.toDF().toDF("event_id", "user_id", "ts"),
        d, "user_id", "ts", Seq("tier"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r =>
            (r.getAs[Long]("event_id"), r.getAs[String]("dim_tier")))
          ()
        }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s14-ckpt").toString)
      .start()
    try {
      val rows = facts.map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Timestamp](2)))
      val (a, b) = rows.splitAt(3)
      input.addData(a); query.processAllAvailable()
      input.addData(b); query.processAllAvailable()
    } finally query.stop()
    val batch = StreamingEnrich.enrichStream(df(facts, factDdl), df(dim,
        dimDdl), "user_id", "ts", Seq("tier"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("dim_tier")))
    assert(out.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq,
      "stream and batch enrichment diverged")
    assert(out.exists(r => r._1 == 4L && r._2 == null),
      "the history gap must enrich NULL in the stream too")
  }
}
