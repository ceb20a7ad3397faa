package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TopK

class TopKSpec extends SparkSpec {

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.select("g", "doc_id", "s", "rank_in_group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))

  test("topNPerGroup equals the naive global window for every partitioning") {
    // Skewed groups (one giant, one tiny), duplicate scores (tiebreak
    // by key must decide), a group smaller than n.
    val data = (1L to 500L).map(i => Row("big", i, i % 7)) ++
      Seq(Row("small", 1001L, 3L), Row("small", 1002L, 3L))
    val d = df(data, "g STRING, doc_id BIGINT, s BIGINT")
    val naive = d.withColumn("rank_in_group",
        row_number().over(Window.partitionBy("g")
          .orderBy(col("s").desc, col("doc_id").asc)))
      .filter(col("rank_in_group") <= 3)
    val expected = rows(naive)
    for (p <- Seq(1, 3, 17, 64)) {
      val got = rows(TopK.topNPerGroup(d.repartition(p), "g", "s", 3,
        keyCol = "doc_id"))
      assert(got.sameElements(expected), s"partitioning $p diverged")
    }
    // The small group (2 rows < n=3) keeps all its rows.
    assert(expected.count(_._1 == "small") == 2)
  }

  test("registered x6_top_per_stratum: 5 per language, exact vs naive") {
    val out = Queries.x6TopPerStratum(spark, sfDir).collect()
    val langs = out.map(_.getString(0)).distinct
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val ranks = out.filter(_.getString(0) == l).map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length) && ranks.length <= 5,
        s"lang $l ranks $ranks")
    }
  }
}
