package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.Packing

/** X9 sequence packing: span tiling, boundary splitting, and the
  * partitioning/block-size invariance of the two-level prefix sum. */
class PackingSpec extends SparkSpec {

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("spans tile each document exactly and sequences fill to the budget") {
    // 3 docs of 6/5/4 tokens into 8-token sequences:
    // stream [0,15): doc1 [0,6), doc2 [6,11) CROSSES the 8-boundary,
    // doc3 [11,15).
    val docs = df(Seq(
      Row(1L, words(6)), Row(2L, words(5)), Row(3L, words(4))),
      "doc_id BIGINT, text STRING")
    val spans = Packing.packSequences(docs, seqLen = 8L, blockSize = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (1L, 0L, 0L, 6L),          // doc1 whole in seq 0
      (2L, 0L, 0L, 2L),          // doc2 first 2 tokens finish seq 0…
      (2L, 1L, 2L, 5L),          // …remaining 3 open seq 1
      (3L, 1L, 0L, 4L)))         // doc3 whole in seq 1
    // Every doc's spans sum to its token count.
    val perDoc = spans.groupBy(_._1).view.mapValues(_.map(s => s._4 - s._3).sum)
    assert(perDoc.toMap == Map(1L -> 6L, 2L -> 5L, 3L -> 4L))
  }

  test("every non-final sequence is filled to exactly seqLen") {
    val packed = Packing.packSequences(Tables.documents(spark, sfDir),
      seqLen = 512L, blockSize = 1000L)
    val fills = packed.groupBy("seq_id")
      .agg(sum(col("end_tok") - col("begin_tok")).as("fill"))
    val lastSeq = fills.agg(max("seq_id")).head().getLong(0)
    assert(fills.filter(col("seq_id") < lastSeq && col("fill") =!= 512L).count() == 0)
  }

  test("materialized sequences reassemble the exact global token stream") {
    val docs = Tables.documents(spark, sfDir)
    val seqs = Packing.materializeSequences(docs, seqLen = 512L,
        blockSize = 100L)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(seqs.nonEmpty)
    // Every non-final sequence is exactly full; seq_tok matches the
    // materialized text's own token count.
    seqs.dropRight(1).foreach { case (id, n, _) =>
      assert(n == 512L, s"seq $id holds $n tokens")
    }
    seqs.foreach { case (id, n, text) =>
      assert(text.split(" ").length.toLong == n, s"seq $id text/count drift")
    }
    // Concatenating the sequences in order reproduces the exact global
    // token stream (documents in key order, every token, no joins or
    // boundary bytes lost).
    import org.apache.spark.sql.functions._
    val stream = docs.filter(length(trim(col("text"))) > 0)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[String]("text").trim.split("\\s+").mkString(" "))
      .mkString(" ")
    assert(seqs.map(_._3).mkString(" ") == stream)
    // Count agrees with the span-level audit.
    val summary = Packing.packingSummary(docs, seqLen = 512L,
      blockSize = 100L).collect().head
    assert(seqs.length.toLong == summary.getAs[Long]("n_sequences"))
  }

  test("output is invariant to physical partitioning, block size, AND fanout") {
    val docs = Tables.documents(spark, sfDir)
    def run(parts: Int, block: Long, fanout: Long = 10000L) =
      Packing.packSequences(docs.repartition(parts), seqLen = 512L,
          blockSize = block, fanout = fanout)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val base = run(4, 1000L)
    assert(run(13, 1000L) == base)   // partitioning-independent
    assert(run(4, 7L) == base)       // hierarchical scan ≡ any block split
    // The superblock level is pure regrouping of integer sums: every
    // fanout (1 = one block per superblock, 3 = many superblocks on this
    // fixture's keyspace) packs identically.
    assert(run(4, 7L, fanout = 1L) == base)
    assert(run(4, 7L, fanout = 3L) == base)
  }

  test("packing summary reports sequences, fill, and split docs") {
    val docs = df(Seq(
      Row(1L, words(6)), Row(2L, words(5)), Row(3L, words(4))),
      "doc_id BIGINT, text STRING")
    val s = Packing.packingSummary(docs, seqLen = 8L, blockSize = 2L).head()
    assert(s.getAs[Long]("n_sequences") == 2L)
    assert(s.getAs[Long]("n_tokens") == 15L)
    assert(s.getAs[Long]("n_spans") == 4L)
    assert(s.getAs[Long]("docs_split") == 1L) // only doc2 crosses
  }

  test("boundary mode: no sequence mixes documents, docs start on boundaries") {
    // 6/5/4-token docs into 8-token sequences with padding: each doc gets
    // its own sequence (none exceeds 8 tokens), starts at k·8.
    val docs = df(Seq(
      Row(1L, words(6)), Row(2L, words(5)), Row(3L, words(4))),
      "doc_id BIGINT, text STRING")
    val spans = Packing.packSequences(docs, seqLen = 8L, blockSize = 2L,
        respectDocBoundaries = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq(
      (1L, 0L, 0L, 6L), (2L, 1L, 0L, 5L), (3L, 2L, 0L, 4L)))
  }

  test("boundary mode on the corpus: exclusive sequences, over-long docs split") {
    val docs = Tables.documents(spark, sfDir)
    val packed = Packing.packSequences(docs, seqLen = 32L, blockSize = 1000L,
      respectDocBoundaries = true)
    // No sequence holds spans from two documents.
    assert(packed.groupBy("seq_id")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).count() == 0)
    // Every document's first span begins at token 0 of a fresh sequence,
    // and its spans tile [0, n_tok) contiguously.
    val bad = packed.groupBy("doc_id")
      .agg(min("begin_tok").as("b0"),
        max("end_tok").as("bn"),
        sum(col("end_tok") - col("begin_tok")).as("covered"),
        first("n_tok").as("n"))
      .filter(col("b0") =!= 0L || col("bn") =!= col("n") ||
        col("covered") =!= col("n"))
    assert(bad.count() == 0)
    // A doc longer than seqLen still spans multiple (its own) sequences.
    assert(packed.groupBy("doc_id").count().filter(col("count") > 1).count() ==
      docs.select(graft.ext.TextAnalysis.tokenCount(col("text")).as("n"))
        .filter(col("n") > 32L).count())
  }

  test("boundary mode is (blockSize, fanout)-invariant with predictable fill") {
    val docs = Tables.documents(spark, sfDir)
    def run(block: Long, fanout: Long) =
      Packing.packSequences(docs, seqLen = 64L, blockSize = block,
          fanout = fanout, respectDocBoundaries = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val base = run(1000L, 10000L)
    assert(run(7L, 3L) == base)
    assert(run(7L, 1L) == base)
    // Fill ratio equals sum(n_tok) / (sum(ceil(n_tok/L)) · L) exactly.
    val s = Packing.packingSummary(docs, seqLen = 64L, blockSize = 1000L,
      respectDocBoundaries = true).head()
    val toks = docs
      .select(graft.ext.TextAnalysis.tokenCount(col("text")).as("n"))
      .filter(col("n") > 0)
      .agg(sum("n").as("t"), sum(expr("(n - 1) div 64 + 1")).as("seqs")).head()
    assert(s.getAs[Long]("n_tokens") == toks.getAs[Long]("t"))
    assert(s.getAs[Long]("n_sequences") == toks.getAs[Long]("seqs"))
    assert(s.getAs[Double]("fill_ratio") ==
      BigDecimal(toks.getAs[Long]("t").toDouble / (toks.getAs[Long]("seqs") * 64L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("empty documents are excluded from the stream") {
    val docs = df(Seq(Row(1L, words(3)), Row(2L, "   "), Row(3L, words(2))),
      "doc_id BIGINT, text STRING")
    val spans = Packing.packSequences(docs, seqLen = 8L, blockSize = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(spans == Set(1L, 3L))
  }
}
