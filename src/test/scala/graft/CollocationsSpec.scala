package graft

import org.apache.spark.sql.Row

import graft.ext.Collocations

class CollocationsSpec extends SparkSpec {

  private val ddl = "doc_id BIGINT, text STRING"

  test("small fixture: exact micro-nat PMI, minCount boundary, bound " +
       "pairs rank above chance pairs") {
    // "x y" always together (5 times) → strongly bound. "a b" appears
    // 5 times but a and b also occur apart → weaker. "c d" only 4
    // times → cut by minCount = 5.
    val rows = Seq(
      Row(1L, "x y a b"), Row(2L, "x y a b"), Row(3L, "x y a b"),
      Row(4L, "x y a b"), Row(5L, "x y a b"),
      Row(6L, "a q b"), Row(7L, "a r b"),
      Row(8L, "c d"), Row(9L, "c d"), Row(10L, "c d"), Row(11L, "c d"))
    val out = Collocations.pmiPairs(df(rows, ddl), k = 10, minCount = 5L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5)))
    val keys = out.map(t => (t._1, t._2)).toSet
    assert(!keys.contains(("c", "d")), "minCount must cut the 4-count pair")
    // Nu = 5*4 + 3 + 3 + 4*2 = 34, Nb = 5*3 + 2 + 2 + 4 = 23.
    // pmi(x,y) = ln((5/23) / ((5/34)*(5/34))): c1 = c2 = 5.
    val xy = out.find(t => t._1 == "x" && t._2 == "y").get
    val expected = math.round(math.log(
      ((5.0 * 34) / 23) * (34.0 / 5) / 5) * 1000000.0)
    assert(xy._4 == expected, s"pmi(x,y) ${xy._4} != $expected")
    // "x y" (exclusive) must outrank "a b" (promiscuous a, b).
    val ab = out.find(t => t._1 == "a" && t._2 == "b").get
    assert(xy._4 > ab._4, "exclusive pair must outrank the diluted one")
  }

  test("top-k is deterministic and partitioning-invariant on the " +
       "documents table") {
    val docs = Tables.documents(spark, sfDir)
    val a = Collocations.pmiPairs(docs, k = 20, minCount = 3L)
      .collect().map(_.toSeq)
    val b = Collocations.pmiPairs(docs.repartition(13), k = 20,
      minCount = 3L).collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq,
      "the ranked pair list must not depend on physical layout")
  }
}
