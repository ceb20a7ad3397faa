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

  test("bm25: term saturation and length normalization behave as the " +
       "formula demands; ranking equals a driver-side reference") {
    // 6 docs: d1/d2 differ only in tf of 'x' (saturation: score(d2) <
    // 2·score(d1)); d3 repeats d1's hit inside a LONGER doc (length
    // discount: score(d3) < score(d1)); d4 has no hit; d5/d6 pad df.
    val d = docs(
      (1L, "x a b c"), (2L, "x x a b"), (3L, "x a b c d e f g h i"),
      (4L, "a b c d"), (5L, "y a"), (6L, "y b"))
    val out = TfIdf.bm25Rank(d, Seq("x", "y"), k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(!out.contains(4L), "a doc with no query term must not rank")
    val s1 = out(1L)._1; val s2 = out(2L)._1; val s3 = out(3L)._1
    assert(s2 > s1 && s2 < 2 * s1, s"saturation violated: $s1 vs $s2")
    assert(s3 < s1, s"length normalization violated: $s1 vs $s3")
    // Driver-side reference of the exact integer formula.
    val texts = Map(1L -> "x a b c", 2L -> "x x a b",
      3L -> "x a b c d e f g h i", 4L -> "a b c d", 5L -> "y a",
      6L -> "y b").view.mapValues(_.split(" ").toSeq).toMap
    val n = texts.size; val ltot = texts.values.map(_.size).sum
    def score(id: Long): (Long, Long) = {
      val hits = Seq("x", "y").flatMap { t =>
        val tf = texts(id).count(_ == t)
        if (tf == 0) None else {
          val df = texts.values.count(_.contains(t))
          val idf = math.round(
            math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1000000.0)
          val den = tf * 1000000L + 1200L * 250L +
            (1200L * 750L * texts(id).size * n) / ltot
          Some((idf * tf * 2200L * 1000L) / den)
        }
      }
      (hits.sum, hits.size.toLong)
    }
    out.foreach { case (id, got) =>
      assert(got == score(id), s"doc $id: $got vs reference ${score(id)}")
    }
  }

  test("persisted index: save -> probe equals the fresh rank, and the " +
       "term probe reaches the postings scan as a pushed filter") {
    val docs5 = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    TfIdf.saveIndex(docs5, dir)
    val probe = TfIdf.bm25Against(spark, dir, Seq("data", "vector", "merge"),
      k = 10)
    val fresh = TfIdf.bm25Rank(docs5, Seq("data", "vector", "merge"), k = 10)
    assert(probe.orderBy("rank").collect().map(_.toSeq).toSeq ==
      fresh.orderBy("rank").collect().map(_.toSeq).toSeq,
      "probe diverged from the fresh rank")
    // The term IN (…) predicate must reach the postings scan.
    val scans = probe.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.toString.contains("term")),
      "expected the term filter at the postings scan")
  }

  test("merged disjoint-shard indexes are indistinguishable from " +
       "indexing the union fresh") {
    val docs5 = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("bm25_merge").toString
    TfIdf.saveIndex(docs5.filter(col("doc_id") % 2 === 0), s"$base/even")
    TfIdf.saveIndex(docs5.filter(col("doc_id") % 2 =!= 0), s"$base/odd")
    TfIdf.mergeIndexes(spark, s"$base/even", s"$base/odd", s"$base/all")
    TfIdf.saveIndex(docs5, s"$base/fresh")
    val terms = Seq("data", "vector", "merge")
    val m = TfIdf.bm25Against(spark, s"$base/all", terms, k = 20)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val f = TfIdf.bm25Against(spark, s"$base/fresh", terms, k = 20)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(m == f, "merge is not equivalent to fresh indexing")
  }

  test("removeDocs: the decremented index probes identically to a fresh " +
       "index on the remainder — zero-token documents included") {
    // doc 4 is NULL-text (dl 0, NO postings rows): its removal must
    // still decrement N — a postings-only decrement would leave idf
    // fit on N=6 while the fresh remainder index has N=4, shifting
    // every score. doc 2 removes a term ('vector') entirely: its df
    // row must LEAVE the frame, not linger at 0.
    val d = docs(
      (1L, "data data merge"),
      (2L, "vector vector"),
      (3L, "data merge merge"),
      (4L, null),
      (5L, "data"),
      (6L, "merge data noise"))
    val base = java.nio.file.Files.createTempDirectory("bm25_rm").toString
    TfIdf.saveIndex(d, s"$base/full")
    val removeKeys = d.filter(col("doc_id").isin(2L, 4L)).select("doc_id")
    TfIdf.removeDocs(spark, s"$base/full", removeKeys, s"$base/kept")
    TfIdf.saveIndex(d.filter(!col("doc_id").isin(2L, 4L)), s"$base/fresh")
    val terms = Seq("data", "vector", "merge")
    for (sub <- Seq("postings", "df", "doclens", "totals")) {
      val got = spark.read.parquet(s"$base/kept/$sub")
      val want = spark.read.parquet(s"$base/fresh/$sub")
      assert(got.collect().map(_.toSeq).sortBy(_.mkString).toSeq ==
        want.collect().map(_.toSeq).sortBy(_.mkString).toSeq,
        s"$sub diverged from the fresh remainder index")
    }
    val probe = TfIdf.bm25Against(spark, s"$base/kept", terms, k = 10)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val fresh = TfIdf.bm25Against(spark, s"$base/fresh", terms, k = 10)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(probe == fresh, "post-removal probe diverged from fresh")
    // 'vector' left the df frame entirely (df hit 0).
    assert(spark.read.parquet(s"$base/kept/df")
      .filter(col("term") === "vector").isEmpty)
    // In-place removal is rejected (the inputs are re-read mid-write).
    intercept[IllegalArgumentException] {
      TfIdf.removeDocs(spark, s"$base/full", removeKeys, s"$base/full")
    }
  }

  test("remove-then-add equals fresh: re-indexing an updated document " +
       "via removeDocs + mergeIndexes is invisible to the probe") {
    val v1 = docs((1L, "data merge"), (2L, "old old stale"), (3L, "vector"))
    val v2Doc2 = docs((2L, "data vector fresh"))
    val after = docs((1L, "data merge"), (2L, "data vector fresh"),
      (3L, "vector"))
    val base = java.nio.file.Files.createTempDirectory("bm25_rma").toString
    TfIdf.saveIndex(v1, s"$base/v1")
    TfIdf.saveIndex(v2Doc2, s"$base/delta")
    TfIdf.removeDocs(spark, s"$base/v1",
      v2Doc2.select("doc_id"), s"$base/less")
    TfIdf.mergeIndexes(spark, s"$base/less", s"$base/delta", s"$base/v2")
    TfIdf.saveIndex(after, s"$base/freshv2")
    val terms = Seq("data", "vector", "merge", "stale")
    val got = TfIdf.bm25Against(spark, s"$base/v2", terms, k = 10)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val want = TfIdf.bm25Against(spark, s"$base/freshv2", terms, k = 10)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(got == want, "remove-then-add is not equivalent to fresh")
  }

  test("scoreAgainst dedupes duplicate query terms (aggregate-path parity)") {
    val d = docs((1L, "data data vector"), (2L, "merge"), (3L, "data"))
    val dir = java.nio.file.Files.createTempDirectory("bm25_dup").toString
    TfIdf.saveIndex(d, dir)
    val once = TfIdf.scoreAgainst(spark, dir, d, Seq("data", "vector"))
      .select("doc_id", "bm25_micro", "terms_hit")
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    val duped = TfIdf.scoreAgainst(spark, dir, d,
        Seq("data", "vector", "data", "data"))
      .select("doc_id", "bm25_micro", "terms_hit")
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(once == duped,
      "duplicate query terms double-counted into bm25_micro/terms_hit")
  }

  test("scoreAgainst is streaming-compatible: micro-batched scores " +
       "equal the batch scorer (stateless projection, literal model)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hist = Tables.documents(spark, sfDir).filter(col("doc_id") < 300)
    val dir = java.nio.file.Files.createTempDirectory("bm25_s8").toString
    TfIdf.saveIndex(hist, dir)
    val terms = Seq("data", "vector", "merge")
    val shardRows = Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 300).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    val query = TfIdf.scoreAgainst(spark, dir, stream, terms)
      .select("doc_id", "bm25_micro", "terms_hit")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))); () }
      }
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-s8-ckpt").toString)
      .start()
    try {
      val (a, b) = shardRows.splitAt(shardRows.length / 2)
      input.addData(a.toSeq); query.processAllAvailable()
      input.addData(b.toSeq); query.processAllAvailable()
    } finally query.stop()
    val batch = Queries.s8StreamBm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.sortBy(_._1).toArray.sameElements(batch),
      "stream and batch relevance scores diverged")
    assert(batch.exists(_._2 > 0) && batch.exists(_._3 == 0),
      "fixture should have both relevant and no-hit documents")
  }

  test("registered x24_bm25_rank: 10 ranked rows, scores descending, " +
       "every hit counted") {
    val out = Queries.x24Bm25Rank(spark, sfDir).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).toSeq == (1L to 10L))
    val scores = out.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(out.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
  }
}
