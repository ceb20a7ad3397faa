package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Compressibility

class CompressibilitySpec extends SparkSpec {

  private val ddl = "doc_id BIGINT, text STRING"

  test("bands: constant runs are junk, prose-like text is normal, " +
       "null/empty band empty; ratio arithmetic is exact") {
    val rows = Seq(
      Row(1L, "z" * 500),
      Row(2L, "the quick brown fox jumps over the lazy dog and then " +
        "wanders off toward a distant hill looking for more dogs"),
      Row(3L, null), Row(4L, ""))
    val out = Compressibility.ratios(df(rows, ddl)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("band") == "junk")
    assert(out(2L).getAs[String]("band") == "normal")
    assert(out(3L).getAs[String]("band") == "empty" &&
      out(4L).getAs[String]("band") == "empty")
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_raw") == 500L)
    assert(r1.getAs[Long]("ratio_ppm") ==
      r1.getAs[Long]("n_deflate") * 1000000L / 500L)
  }

  test("repetition compresses: a doc of one phrase repeated scores " +
       "strictly below the same tokens shuffled apart") {
    val phrase = "data quality is a property of pipelines "
    val repeated = phrase * 25
    // Same character multiset, broken periodicity.
    val mixed = scala.util.Random.javaRandomToRandom(
      new java.util.Random(42)).shuffle(repeated.toSeq).mkString
    val out = Compressibility.ratios(df(Seq(
        Row(1L, repeated), Row(2L, mixed)), ddl))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("ratio_ppm")).toMap
    assert(out(1L) < out(2L),
      s"repetition must compress better: ${out(1L)} vs ${out(2L)}")
  }

  test("ratios are deterministic and partitioning-invariant on the " +
       "documents table") {
    val docs = Tables.documents(spark, sfDir)
    val a = Compressibility.ratios(docs.select("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val b = Compressibility.ratios(
        docs.select("doc_id", "text").repartition(13))
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }
}
