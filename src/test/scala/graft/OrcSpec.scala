package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.sources.Orc

class OrcSpec extends SparkSpec {

  private val ddl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  test("hostile strings round-trip byte-identically; NULL and \"\" stay " +
       "distinct without any sentinel") {
    val hostile = Seq(
      Row(1L, "comma, separated, values", "en", "s", 10L),
      Row(2L, "quote \" and \"\"doubled\"\" quotes", "en", "s", 10L),
      Row(3L, "line one\nline two\r\nline three", "en", "s", 10L),
      Row(4L, "emoji 😀 CJK 漢字 combining é", "zh", "s", 10L),
      Row(5L, null, null, "s", 0L),
      Row(6L, "", "en", "s", 0L),
      Row(7L, "trailing spaces   ", "en", "s", 5L))
    val d = df(hostile, ddl)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_spec")
    Orc.write(d, dir.toString, numShards = 2)
    val back = Orc.read(spark, dir.toString, ddl)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    val orig = d.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    assert(back.sameElements(orig),
      s"ORC round trip diverged:\n${back.mkString("\n")}\nvs\n${orig.mkString("\n")}")
    val files = new java.io.File(dir.toString).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".orc"))
    assert(files == 2, s"expected 2 shards, found $files")
  }

  test("schema drift between file and pipeline expectation fails loudly") {
    val d = df(Seq(Row(1L, "t", "en", "s", 1L)), ddl)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_drift")
    Orc.write(d, dir.toString)
    val ex = intercept[IllegalArgumentException] {
      Orc.read(spark, dir.toString,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars INT")
    }
    assert(ex.getMessage.contains("schema drift"),
      s"expected a named drift error, got: ${ex.getMessage}")
  }

  test("nested nullability is not drift: a non-nullable array element " +
       "round-trips even though ORC marks every level nullable") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false),
        nullable = false)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, Seq(1L, 2L)),
        Row(2L, Seq(3L))), 1), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_nested")
    Orc.write(d, dir.toString)
    // Must NOT throw: nullability differs at the nested level only.
    val back = Orc.read(spark, dir.toString, schema)
    assert(back.count() == 2)
    // A genuine nested TYPE drift still fails.
    intercept[IllegalArgumentException] {
      Orc.read(spark, dir.toString, "doc_id BIGINT, v ARRAY<INT>")
    }
  }

  test("predicate pushdown reaches the ORC scan (stripe-skip capable)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_push")
    Orc.write(Tables.documents(spark, sfDir), dir.toString)
    val filtered = Orc.read(spark, dir.toString,
        Tables.documents(spark, sfDir).schema)
      .filter(col("doc_id") > 100L).select("doc_id", "n_chars")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]")
        || plan.contains("PushedFilters: [GreaterThan(doc_id,100)"),
      s"doc_id filter did not reach the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"column pruning did not reach the ORC scan:\n$plan")
  }
}
