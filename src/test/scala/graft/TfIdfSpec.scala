package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.TfIdf

class TfIdfSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    df(rows.map { case (id, t) => Row(id, t) }, "doc_id BIGINT, text STRING")

  test("corpus-wide terms score zero; distinctive terms rank first") {
    // 'common' appears in every doc (idf 0); each doc's unique term wins.
    val d = docs(
      (1L, "common alpha alpha beta"),
      (2L, "common gamma"),
      (3L, "common delta delta delta"))
    val top = TfIdf.topTerms(d, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("term"),
        r.getAs[Long]("score_micro"))).toMap
    assert(top(1L)._1 == "alpha" && top(3L)._1 == "delta")
    assert(top.values.forall(_._2 > 0L))
    // And 'common' scores exactly 0 everywhere (ln(3/3) = 0).
    val all = TfIdf.topTerms(d, k = 10).collect()
    assert(all.filter(_.getAs[String]("term") == "common")
      .forall(_.getAs[Long]("score_micro") == 0L))
  }

  test("tf multiplies the integer idf; ties rank by term") {
    val d = docs((1L, "x x y z"), (2L, "p q"))
    val r1 = TfIdf.topTerms(d, k = 3).filter(col("doc_id") === 1L)
      .orderBy("rank").collect()
    // x (tf 2) outranks y/z (tf 1); y and z tie -> term order.
    assert(r1.map(_.getAs[String]("term")).toSeq == Seq("x", "y", "z"))
    assert(r1(0).getAs[Long]("score_micro") ==
      2L * r1(1).getAs[Long]("score_micro") / 1L / 1L)
  }

  test("registered x24 is partitioning-invariant with <= 3 rows per doc") {
    val a = Queries.x24TfidfTerms(spark, sfDir).collect()
    val b = graft.ext.TfIdf.topTerms(
        Tables.documents(spark, sfDir).repartition(13), k = 3)
      .orderBy("doc_id", "rank").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    assert(a.nonEmpty)
  }

  test("bad k rejected") {
    intercept[IllegalArgumentException] {
      TfIdf.topTerms(docs((1L, "a")), k = 0)
    }
  }
}
