package graft

import org.apache.spark.sql.functions._

import graft.ext.Curation

/** The capstone: the full training-data journey a real user runs,
  * chained end to end under a config no single registered query uses —
  * stacked text rewrites (cross-doc boilerplate strip + within-doc line
  * dedup), the keeper policy, 4-way sharded corpus write, reader-side
  * layout audit, then the PACKED artifact built from the RE-READ corpus
  * (the write-then-read production discipline the writePacked Scaladoc
  * prescribes), with token-mass conservation asserted across every
  * stage boundary. */
class PipelineE2ESpec extends SparkSpec {

  test("calibrated funnel → curate → upsample(epochs) → JSONL export " +
       "→ re-read composes; every boundary conserves what it must") {
    import graft.ext.{Calibrate, Mixing, TextAnalysis}
    import graft.sources.Jsonl
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("bench_id"), col("text"))
    // Adaptive per-language floor, fitted on the corpus itself (the
    // FineWeb shape), composed as a funnel quality signal.
    val cuts = Calibrate.thresholds(
      docs.select(col("lang"),
        TextAnalysis.tokenCount(col("text")).as("nt")),
      "nt", "lang", minPpm = 100000L)
    val cfg = Curation.Config(minTokens = 1L, rates = Map("en" -> 0.4),
      seqLen = 64L, calibCuts = Some(cuts))
    val curated = Curation.curate(docs, bench, cfg).cache()
    try {
      val nDocs = curated.count()
      assert(nDocs > 0L, "the journey needs survivors")
      // Epoch expansion: one source trains 2.0 epochs — row mass
      // doubles EXACTLY for it (whole factors have no keep draw).
      val src = curated.select("source").head.getString(0)
      val up = Mixing.upsample(curated, Map(src -> 2000000L))
      val perSrc = up.groupBy("source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val basePerSrc = curated.groupBy("source")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      basePerSrc.foreach { case (s, n) =>
        val want = if (s == src) 2 * n else n
        assert(perSrc(s) == want, s"$s: ${perSrc(s)} vs $want")
      }
      // Export the expanded corpus as sharded JSONL and re-read it:
      // the (doc_id, epoch_idx) multiset and token mass round-trip.
      val dir = java.nio.file.Files.createTempDirectory("e2e_jsonl").toString
      val export = up.select("doc_id", "epoch_idx", "text", "n_tok")
        .withColumn("jk",
          col("doc_id") * lit(Mixing.MaxEpochs) + col("epoch_idx"))
      Jsonl.write(export, dir, numShards = 3, keyCol = "jk")
      val back = Jsonl.read(spark, dir,
        "doc_id BIGINT, epoch_idx BIGINT, text STRING, n_tok BIGINT, jk BIGINT")
      assert(back.count() == up.count())
      assert(back.agg(sum("n_tok")).head.getLong(0) ==
        up.agg(sum("n_tok")).head.getLong(0))
      val keysBack = back.select("jk").collect().map(_.getLong(0)).sorted
      val keysUp = export.select("jk").collect().map(_.getLong(0)).sorted
      assert(keysBack.sameElements(keysUp),
        "the exported copy multiset drifted through JSONL")
    } finally curated.unpersist()
  }

  test("curate → group-split(by source) → per-split dataset card " +
       "composes: no source straddles, cards fold to the corpus card") {
    import graft.ext.{DatasetCard, Sampling}
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("bench_id"), col("text"))
    val curated = graft.ext.Curation.curate(docs, bench,
      graft.ext.Curation.Config(minTokens = 1L)).cache()
    try {
      // Leakage-safe split by SOURCE: every source's survivors land in
      // one split (the near-dup-family rationale — same-source docs
      // are the correlated ones).
      val split = curated.withColumn("split",
        Sampling.assignSplitByGroup(col("source"),
          Seq("train" -> 0.8, "val" -> 0.2)))
      val straddle = split.groupBy("source")
        .agg(countDistinct(col("split")).as("k"))
        .filter(col("k") > 1).count()
      assert(straddle == 0L, "a source straddled the split")
      // The datasheet of each split + the whole: additive columns of
      // the per-split corpus-total rows must fold to the full card's.
      val whole = DatasetCard.card(curated)
        .filter(col("grouping_level") === 1L).head
      val parts = split.select("doc_id", "text", "lang", "source", "split")
        .collect().groupBy(_.getAs[String]("split"))
      val partTotals = parts.keys.toSeq.map { sp =>
        DatasetCard.card(split.filter(col("split") === sp)
          .drop("split")).filter(col("grouping_level") === 1L).head
      }
      for (c <- Seq("n_docs", "n_tokens", "n_chars", "docs_with_pii")) {
        assert(whole.getAs[Long](c) ==
          partTotals.map(_.getAs[Long](c)).sum,
          s"$c does not fold across splits")
      }
    } finally curated.unpersist()
  }

  test("the registered x10_split_cards capstone: straddle pinned at " +
       "zero; per-split cards fold to the corpus-total row") {
    val out = Queries.x10SplitCards(spark, sfDir).collect()
    assert(out.length >= 2, "expected at least one split row plus (all)")
    out.foreach(r =>
      assert(r.getAs[Long]("n_straddling_sources") == 0L,
        "a source straddled the split — the leakage guarantee broke"))
    val all = out.filter(_.getAs[Long]("grouping_level") == 1L)
    assert(all.length == 1, "exactly one corpus-total row")
    val parts = out.filter(_.getAs[Long]("grouping_level") == 0L)
    for (c <- Seq("n_docs", "n_tokens", "n_chars", "docs_with_pii")) {
      assert(all.head.getAs[Long](c) == parts.map(_.getAs[Long](c)).sum,
        s"$c does not fold across splits")
    }
  }

  test("curate → write(shards) → audit → re-read → writePacked composes") {
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("bench_id"), col("text"))
    val cfg = Curation.Config(minTokens = 5L, maxTokens = 200L,
      rates = Map("en" -> 0.4), seqLen = 64L,
      xdocMinDf = Some(3L), dedupLinesFirst = true,
      keeperQuality = Some(length(col("text"))))
    val curated = Curation.curate(docs, bench, cfg).cache()
    try {
      val nDocs = curated.count()
      assert(nDocs > 0L, "the journey needs survivors")
      val tokSum = curated.agg(sum("n_tok")).head.getLong(0)

      // Terminal corpus artifact: 4-way sharded write + the reader-side
      // audit must agree with what was written, row for row.
      val dir = java.nio.file.Files.createTempDirectory("e2e_corpus").toString
      Curation.write(curated, dir, numShards = 4)
      val a = Curation.auditLayout(spark, dir, numShards = 4).collect().head
      assert(a.getAs[Long]("n_rows") == nDocs)
      assert(a.getAs[Long]("bad_split") == 0L &&
        a.getAs[Long]("bad_shuffle_key") == 0L &&
        a.getAs[Long]("bad_shard") == 0L)

      // Token mass survives the write → read round trip exactly.
      val back = spark.read.parquet(dir).cache()
      try {
        assert(back.agg(sum("n_tok")).head.getLong(0) == tokSum)
        val bySplit = back.groupBy("split").agg(sum("n_tok").as("t"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(bySplit.contains("train"), s"train split empty: $bySplit")

        // Packed artifact from the RE-READ corpus. writePacked
        // re-derives the split with the same salted seed, so its splits
        // must agree with the persisted ones — and per split, packing
        // conserves the token mass and fills every non-final sequence
        // exactly (n_seqs = ceil(tokens / seqLen)).
        val dir2 = java.nio.file.Files.createTempDirectory("e2e_packed").toString
        Curation.writePacked(back, dir2, seqLen = 64L, numShards = 2)
        val seqs = spark.read.parquet(dir2)
        val packBySplit = seqs.groupBy("split")
          .agg(sum("seq_tok").as("t"), count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        assert(packBySplit.keySet == bySplit.keySet)
        packBySplit.foreach { case (split, (t, n)) =>
          assert(t == bySplit(split),
            s"split $split: packed mass $t != corpus mass ${bySplit(split)}")
          assert(n == (t + 63L) / 64L,
            s"split $split: $n sequences for $t tokens at seqLen 64")
        }
        // The packed shard layout replays its pure derivation.
        assert(seqs.filter(col("shard") =!=
          pmod(col("seq_id"), lit(2L)).cast("int")).count() == 0L)
      } finally back.unpersist()
    } finally curated.unpersist()
  }
}
