package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Chunking

class ChunkingSpec extends SparkSpec {

  private def doc(id: Long, nTok: Int) =
    Row(id, (1 to nTok).map(i => s"t$i").mkString(" "))

  private def docs(rows: Row*) = df(rows, "doc_id BIGINT, text STRING")

  private def chunks(d: org.apache.spark.sql.DataFrame,
                     c: Int, o: Int): Map[Long, Seq[Long]] =
    Chunking.chunkTokens(d, chunkTokens = c, overlap = o)
      .orderBy("doc_id", "chunk_idx")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Long]("n_tok_chunk")).toSeq).toMap

  test("boundary chunk counts: <=, exact multiple, one over") {
    val m = chunks(docs(doc(1L, 5), doc(2L, 10), doc(3L, 11), doc(4L, 18)),
      c = 10, o = 2)
    assert(m(1L) == Seq(5L))          // under one window
    assert(m(2L) == Seq(10L))         // exactly one window
    assert(m(3L) == Seq(10L, 3L))     // stride 8: tokens 9..11
    assert(m(4L) == Seq(10L, 10L))    // 18 = 8 + 10: second window full
  }

  test("overlap repeats the boundary tokens; zero overlap partitions") {
    val d = docs(doc(1L, 12))
    val withOverlap = Chunking.chunkTokens(d, chunkTokens = 8, overlap = 4)
      .orderBy("chunk_idx").collect()
    assert(withOverlap.map(_.getAs[Long]("n_tok_chunk")).toSeq == Seq(8L, 8L))
    val disjoint = chunks(d, c = 8, o = 0)
    assert(disjoint(1L) == Seq(8L, 4L))
  }

  test("null and blank docs yield no chunks") {
    val d = df(Seq(Row(1L, null), Row(2L, "   "), Row(3L, "a b")),
      "doc_id BIGINT, text STRING")
    val m = chunks(d, c = 4, o = 1)
    assert(m.keySet == Set(3L) && m(3L) == Seq(2L))
  }

  test("every token is covered and overlaps reconstruct the document") {
    val d = docs(doc(1L, 100))
    val out = Chunking.chunkTokens(d, chunkTokens = 32, overlap = 8)
      .orderBy("chunk_idx").collect()
    val n = out.map(_.getAs[Long]("n_tok_chunk")).sum
    val stride = 32 - 8
    val nChunks = out.length
    // total emitted = n + overlap per interior boundary
    assert(nChunks == (100 - 33) / stride + 2)
    assert(n == 100L + 8L * (nChunks - 1))
  }

  test("bad parameters rejected") {
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(docs(doc(1L, 3)), chunkTokens = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(docs(doc(1L, 3)), chunkTokens = 0)
    }
  }
}
