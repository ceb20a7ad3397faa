package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {

  private val ddl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  test("hostile strings round-trip byte-identically: newlines, quotes, " +
       "backslashes, tabs, non-BMP, nulls") {
    val hostile = Seq(
      Row(1L, "line one\nline two\r\nline three", "en", "s", 10L),
      Row(2L, "quote \" backslash \\ tab \t done", "en", "s", 10L),
      Row(3L, "emoji 😀 CJK 漢字 combining é", "zh", "s", 10L),
      Row(4L, null, null, "s", 0L),
      Row(5L, "", "en", "s", 0L),
      Row(6L, "{\"looks\": \"like json\"}", "en", "s", 5L))
    val d = df(hostile, ddl)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
    Jsonl.write(d, dir.toString, numShards = 2)
    val back = Jsonl.read(spark, dir.toString, ddl)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    val orig = d.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    assert(back.sameElements(orig))
  }

  test("sharding: numShards files, contents invariant across input " +
       "partitionings, one doc per line") {
    val d = Tables.documents(spark, sfDir)
    val dirA = java.nio.file.Files.createTempDirectory("graft_jsonl_a")
    val dirB = java.nio.file.Files.createTempDirectory("graft_jsonl_b")
    Jsonl.write(d.repartition(1), dirA.toString, numShards = 3)
    Jsonl.write(d.repartition(13), dirB.toString, numShards = 3)
    def files(p: java.nio.file.Path) = new java.io.File(p.toString)
      .listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(files(dirA).length == 3 && files(dirB).length == 3)
    // Byte-stable: the shard router is a pure row function, so the
    // same rows land in the same shard FILE with the same bytes no
    // matter how the input was partitioned (within-file order is the
    // shuffle's; compare as line SETS per shard).
    files(dirA).zip(files(dirB)).foreach { case (a, b) =>
      val (la, lb) = (scala.io.Source.fromFile(a, "UTF-8").getLines().toSet,
        scala.io.Source.fromFile(b, "UTF-8").getLines().toSet)
      assert(la == lb, s"shard ${a.getName} diverged across partitionings")
    }
    val total = files(dirA).map(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().size).sum
    assert(total == d.count(), "one document per line, all documents")
  }

  test("FAILFAST read: a corrupt line kills the job instead of " +
       "leaking null documents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad")
    java.nio.file.Files.write(dir.resolve("part-00000.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, dir.toString, ddl).collect()
    }
    assert(ex.getMessage != null)
  }

  test("registered x29_jsonl_roundtrip: census equals the parquet-side " +
       "derivation directly") {
    val got = Queries.x29JsonlRoundtrip(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = Tables.documents(spark, sfDir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("cs"))
      .orderBy("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sameElements(expected))
  }
}
