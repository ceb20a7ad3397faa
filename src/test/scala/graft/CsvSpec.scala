package graft

import org.apache.spark.sql.Row

import graft.sources.Csv

class CsvSpec extends SparkSpec {

  private val ddl =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  test("hostile strings round-trip byte-identically: embedded commas, " +
       "quotes, newlines, non-BMP, null vs empty string") {
    val hostile = Seq(
      Row(1L, "comma, separated, values", "en", "s", 10L),
      Row(2L, "quote \" and \"\"doubled\"\" quotes", "en", "s", 10L),
      Row(3L, "line one\nline two\r\nline three", "en", "s", 10L),
      Row(4L, "emoji 😀 CJK 漢字 combining é", "zh", "s", 10L),
      Row(5L, null, null, "s", 0L),   // NULL must stay NULL…
      Row(6L, "", "en", "s", 0L),     // …and "" must stay "" (the CSV trap)
      Row(7L, "trailing spaces   ", "en", "s", 5L))
    val d = df(hostile, ddl)
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec")
    Csv.write(d, dir.toString, numShards = 2)
    val back = Csv.read(spark, dir.toString, ddl)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    val orig = d.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1)
    assert(back.sameElements(orig),
      s"CSV round trip diverged:\n${back.mkString("\n")}\nvs\n${orig.mkString("\n")}")
  }

  test("FAILFAST read: a malformed row kills the job instead of leaking nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad")
    java.nio.file.Files.writeString(
      dir.resolve("part-00000.csv"),
      "doc_id,text,lang,source,n_chars\nnot_a_number,oops,en,s,xyz\n")
    val ex = intercept[org.apache.spark.SparkException] {
      Csv.read(spark, dir.toString, ddl).collect()
    }
    assert(ex.getMessage != null)
  }
}
