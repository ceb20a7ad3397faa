package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.stream.StreamingDedup

/** Streaming exact dedup: cross-batch duplicate drop, watermark-bounded
  * state eviction (re-admission after the horizon), and batch-replay
  * parity with the batch dedup path. */
class StreamingDedupSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("duplicates are dropped across micro-batches; evicted keys re-admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")

    val out = mutable.Buffer[String]()
    val query = StreamingDedup
      .exactDedupStream(stream, "ts", "text", watermarkDelay = "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getAs[String]("text")); () }
      }
      .option("checkpointLocation", Files.tmp("graft-sdedup-ckpt"))
      .start()
    try {
      // Batch 1: two case/whitespace variants of one document — ONE survives.
      input.addData((ts(0), "The  Quick Fox"), (ts(1), "the quick fox"))
      query.processAllAvailable()
      assert(out.size == 1)

      // Batch 2: a third variant within the horizon — dropped.
      input.addData((ts(5), "THE QUICK FOX"))
      query.processAllAvailable()
      assert(out.size == 1)

      // Batch 3: unrelated doc at 10:40 pushes the watermark to 10:30,
      // past the key's 10:00+10min horizon → its state is evicted.
      input.addData((ts(40), "something else entirely"))
      query.processAllAvailable()
      assert(out.size == 2)

      // Batch 4: the same document AFTER eviction is re-admitted — the
      // documented trade-off of horizon-bounded streaming dedup.
      input.addData((ts(45), "the quick fox"))
      query.processAllAvailable()
      assert(out.size == 3)
    } finally query.stop()
  }

  test("batch replay matches the batch dedup path's unique count") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ts", expr("timestamp_micros(doc_id * 1000000)"))
    val summary = StreamingDedup.dedupSummary(docs, "ts").head()
    val batchUnique = Dedup.exactDedup(Tables.documents(spark, sfDir)).count()
    assert(summary.getAs[Long]("n_docs") == docs.count())
    assert(summary.getAs[Long]("n_unique") == batchUnique)
    assert(summary.getAs[Long]("n_dups") ==
      summary.getAs[Long]("n_docs") - summary.getAs[Long]("n_unique"))
  }

  test("registered s2_stream_dedup finds exactly the planted duplicates") {
    val row = Queries.s2StreamDedup(spark, sfDir).head()
    val base = Tables.documents(spark, sfDir).count()
    val baseUnique = Dedup.exactDedup(Tables.documents(spark, sfDir)).count()
    assert(row.getAs[Long]("n_docs") == base + 5)
    assert(row.getAs[Long]("n_unique") == baseUnique)
    assert(row.getAs[Long]("n_dups") == base + 5 - baseUnique)
  }

  test("history-index dedup drops last-month's dups even past the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val history = df(Seq(
        org.apache.spark.sql.Row(1L, "seen last month"),
        org.apache.spark.sql.Row(2L, "also archived content")),
      "doc_id BIGINT, text STRING")
    val historyFp = Dedup.fingerprints(history)
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val out = mutable.Buffer[String]()
    val query = StreamingDedup
      .exactDedupStreamAgainst(stream, historyFp, "ts", "text",
        watermarkDelay = "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getAs[String]("text")); () }
      }
      .option("checkpointLocation", Files.tmp("graft-sdedup-hist-ckpt"))
      .start()
    try {
      // History dup (modulo normalization) drops; new doc survives.
      input.addData((ts(0), "Seen  LAST month"), (ts(1), "fresh new document"))
      query.processAllAvailable()
      assert(out.toSeq == Seq("fresh new document"))
      // Within-horizon dup of the new doc drops (stateful path intact).
      input.addData((ts(5), "FRESH new document"))
      query.processAllAvailable()
      assert(out.size == 1)
      // A far-future NEW doc advances the watermark past the first key's
      // horizon (history rows can't drive the watermark — the anti join
      // filters them before the event-time node).
      input.addData((ts(40), "another brand new doc"))
      query.processAllAvailable()
      assert(out.size == 2)
      // A history dup STILL drops after eviction — the index is
      // horizon-proof — while the evicted NEW key re-admits (the
      // documented horizon trade, now scoped to new content only).
      input.addData((ts(41), "also archived content"))
      query.processAllAvailable()
      assert(out.size == 2, "history dup must drop even after eviction")
      input.addData((ts(45), "fresh new document"))
      query.processAllAvailable()
      assert(out.size == 3, "evicted NEW key re-admits (documented horizon trade)")
    } finally query.stop()
  }

  test("per-row minhash signature equals the aggregate batch form") {
    // minhashSignatures now RIDES the per-row expression, so the
    // independent side of this parity pin is the min-aggregate
    // derivation (minhashSignaturesAgg) — two implementations sharing
    // only the tokenizer; this pins that the hash composition never
    // diverges.
    val docs = Tables.documents(spark, sfDir).limit(100)
    val batch = Dedup.minhashSignaturesAgg(docs, n = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perRow = docs
      .withColumn("__toks", split(Dedup.normText(col("text")), "\\s+"))
      .select(col("doc_id"),
        Dedup.minhashSigFromToks(col("__toks"), n = 4).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    // Docs absent from the batch frame (no shingles) must be null per-row.
    perRow.foreach { case (id, sig) =>
      assert(batch.get(id).orNull == sig, s"doc $id")
    }
    assert(batch.keySet.subsetOf(perRow.keySet))
  }

  test("streaming near-dup drop set equals minhashPairsAgainst's on batch replay") {
    val docs = Tables.documents(spark, sfDir)
    val history = docs.filter(col("doc_id") < 300)
    val shard = docs.filter(col("doc_id") >= 300)
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 10000))
    val historySigs = Dedup.minhashSignatures(history, n = 4)
    val survivors = StreamingDedup.minhashDropStreamAgainst(
        shard, historySigs, n = 4, bands = 8, minSim = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dropSet = Dedup.minhashPairsAgainst(shard, historySigs,
        n = 4, bands = 8, minSim = 0.7)
      .select("doc_id_new").collect().map(_.getLong(0)).toSet
    val all = shard.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- dropSet)
    // The planted history copies (docs 0-9 re-keyed) must all be in the
    // drop set — est_jaccard 1.0 against their originals.
    (10000L until 10010L).foreach(id => assert(dropSet.contains(id), s"plant $id"))
  }

  test("live stream: near-dups of history drop per micro-batch, new docs survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // History docs are long enough for 3-gram shingles; the probe batch
    // sends one lightly-edited near-dup (drops), one novel doc
    // (survives), and one too-short doc (null signature — survives).
    val history = df(Seq(
        org.apache.spark.sql.Row(1L,
          "the quick brown fox jumps over the lazy dog again and again today")),
      "doc_id BIGINT, text STRING")
    val historySigs = Dedup.minhashSignatures(history, n = 3)
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val out = mutable.Buffer[String]()
    val query = StreamingDedup
      .minhashDropStreamAgainst(stream, historySigs, n = 3, minSim = 0.7)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getAs[String]("text")); () }
      }
      .option("checkpointLocation", Files.tmp("graft-sneardup-ckpt"))
      .start()
    try {
      input.addData(
        (ts(0), "The  QUICK brown fox jumps over the lazy dog again and again today"),
        (ts(1), "completely different content about spark structured streaming joins"),
        (ts(2), "too short"))
      query.processAllAvailable()
      assert(out.toSet == Set(
        "completely different content about spark structured streaming joins",
        "too short"))
      // Second micro-batch: another history near-dup still drops (the
      // static index is horizon-free by construction — no state involved).
      input.addData((ts(40),
        "the quick brown fox jumps over the lazy dog again and again TODAY"))
      query.processAllAvailable()
      assert(out.size == 2)
    } finally query.stop()
  }

  test("per-row simhash equals the aggregate batch form") {
    // simhashSignatures now RIDES the per-row expression, so the
    // independent side of this parity pin is the 64-sum-aggregate
    // derivation (simhashSignaturesAgg) — two implementations sharing
    // only the tokenizer.
    val docs = Tables.documents(spark, sfDir).limit(100)
    val batch = Dedup.simhashSignaturesAgg(docs, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs
      .withColumn("__toks", split(Dedup.normText(col("text")), "\\s+"))
      .select(col("doc_id"), Dedup.simhashSigFromToks(col("__toks"), n = 4).as("sh"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    perRow.foreach { case (id, sig) =>
      assert(batch.get(id) == sig, s"doc $id")
    }
    assert(batch.keySet.subsetOf(perRow.keySet))
  }

  test("streaming simhash drop set equals simhashPairsAgainst's on batch replay") {
    val docs = Tables.documents(spark, sfDir)
    val history = docs.filter(col("doc_id") < 300)
    val shard = docs.filter(col("doc_id") >= 300)
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 10000))
    val historySigs = Dedup.simhashSignatures(history, n = 4)
    val survivors = StreamingDedup.simhashDropStreamAgainst(
        shard, historySigs, n = 4, maxHamming = 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dropSet = Dedup.simhashPairsAgainst(shard, historySigs,
        n = 4, maxHamming = 6)
      .select("doc_id_new").collect().map(_.getLong(0)).toSet
    val all = shard.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- dropSet)
    (10000L until 10010L).foreach(id => assert(dropSet.contains(id), s"plant $id"))
  }

  test("live stream: simhash near-dups of history drop per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // A normalization-equivalent copy has the identical token array,
    // hence Hamming 0 — drops deterministically; a novel doc's 64-bit
    // signature sits ~32 bits away — survives; a doc shorter than n
    // tokens has a null signature — survives.
    val history = df(Seq(
        org.apache.spark.sql.Row(1L,
          "the quick brown fox jumps over the lazy dog again and again today")),
      "doc_id BIGINT, text STRING")
    val historySigs = Dedup.simhashSignatures(history, n = 3)
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF().toDF("ts", "text")
    val out = mutable.Buffer[String]()
    val query = StreamingDedup
      .simhashDropStreamAgainst(stream, historySigs, n = 3, maxHamming = 3)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getAs[String]("text")); () }
      }
      .option("checkpointLocation", Files.tmp("graft-ssimhash-ckpt"))
      .start()
    try {
      input.addData(
        (ts(0), "The  QUICK brown fox jumps over the lazy dog again and again today"),
        (ts(1), "completely different content about spark structured streaming joins"),
        (ts(2), "too short"))
      query.processAllAvailable()
      assert(out.toSet == Set(
        "completely different content about spark structured streaming joins",
        "too short"))
      // Second micro-batch: the static index is horizon-free — a later
      // normalization-equivalent copy still drops with no state.
      input.addData((ts(40),
        "the quick brown fox jumps over the lazy dog AGAIN and again today"))
      query.processAllAvailable()
      assert(out.size == 2)
    } finally query.stop()
  }

  test("live stream: embedding near-dups of the saved band index drop per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sfDir)
    val history = emb.filter(col("vec_id") < 100)
    val historyBands = graft.ext.Similarity.lshBands(
      history, "vec_id", "embedding", dim = 64, numBits = 64,
      bands = 8, seed = 42L)
    // Planted copy of a history vector (cosine exactly 1.0 — drops under
    // any hyperplane family) vs a non-history vector (base corpus max
    // pairwise cosine far below 0.95 — survives).
    val copyVec = emb.filter(col("vec_id") === 3L)
      .select("embedding").head().getSeq[Float](0)
    val novelVec = emb.filter(col("vec_id") === 400L)
      .select("embedding").head().getSeq[Float](0)
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val out = mutable.Buffer[Long]()
    val query = StreamingDedup
      .embedDropStreamAgainst(stream, historyBands, history, minSim = 0.95)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized { out ++= b.collect().map(_.getAs[Long]("vec_id")); () }
      }
      .option("checkpointLocation", Files.tmp("graft-sann-ckpt"))
      .start()
    try {
      input.addData((9001L, copyVec), (9002L, novelVec))
      query.processAllAvailable()
      assert(out.toSet == Set(9002L), s"got ${out.toSet}")
      // Second micro-batch: static index is horizon-free — a later copy
      // still drops with no state.
      input.addData((9003L, copyVec))
      query.processAllAvailable()
      assert(out.size == 1)
    } finally query.stop()
  }

  test("streaming ann drop set equals the brute-force cosine predicate on batch replay") {
    // The s6 oracle's premise, pinned engine-side: on this corpus the
    // only >= 0.95 pairs are identical vectors, which collide in every
    // band — so the LSH-gated drop equals the exhaustive NOT-EXISTS.
    val emb = Tables.embeddings(spark, sfDir)
    val survivors = Queries.s6StreamAnnDrop(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val history = emb.filter(col("vec_id") < 300)
      .select(col("vec_id").as("hid"), col("embedding").as("hvec"))
    val shard = emb.filter(col("vec_id") >= 300)
      .unionByName(emb.filter(col("vec_id") < 10)
        .withColumn("vec_id", col("vec_id") + 10000))
    val brute = shard.join(history,
        round(graft.ext.Similarity.cosine(col("embedding"), col("hvec")), 4)
          >= 0.95, "left_anti")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(survivors == brute)
    (10000L until 10010L).foreach(id =>
      assert(!survivors.contains(id), s"plant $id must drop"))
  }

  test("history-index dedup batch replay equals the batch incremental path") {
    val docs = Tables.documents(spark, sfDir)
    val history = docs.filter(col("doc_id") < 300)
    val shard = docs.filter(col("doc_id") >= 300)
      .withColumn("ts", expr("timestamp_micros(doc_id * 1000000)"))
    val streamed = StreamingDedup.exactDedupStreamAgainst(
        shard, Dedup.fingerprints(history), "ts")
      .count()
    val batch = Dedup.exactDedupAgainst(
      docs.filter(col("doc_id") >= 300), Dedup.fingerprints(history)).count()
    assert(streamed == batch)
  }
}
