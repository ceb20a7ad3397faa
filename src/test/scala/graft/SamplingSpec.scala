package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** X6 deterministic stratified sampling: reproducibility across
  * partitionings, per-stratum rate accuracy, and filter semantics. */
class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("survivor set is identical across partitionings and repeated runs") {
    def ids(parts: Int): Seq[Long] =
      Sampling.stratifiedSample(docs.repartition(parts), "doc_id", "lang",
          Map("en" -> 0.4), seed = 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids(2) == ids(13))
    assert(ids(2) == ids(2)) // deterministic, not RNG-backed
  }

  test("achieved rates track configured rates per stratum") {
    val summary = Sampling.sampleSummary(docs, "doc_id", "lang",
        Map("en" -> 0.4, "zh" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // Hash buckets are uniform-ish; strata here have 60+ docs, so the
    // achieved rate should land within ±0.15 of the target.
    assert(math.abs(summary("en") - 0.4) < 0.15, s"en: ${summary("en")}")
    assert(math.abs(summary("zh") - 0.5) < 0.15, s"zh: ${summary("zh")}")
    assert(summary("de") == 1.0 && summary("fr") == 1.0 && summary("es") == 1.0)
  }

  test("rate 0 drops a stratum entirely; rate 1 keeps it entirely") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.0), defaultRate = 1.0)
    assert(out.filter(col("lang") === "en").count() == 0)
    assert(out.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count())
  }

  test("different seeds select different survivor sets") {
    def ids(seed: Long) =
      Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.4),
          seed = seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(1L) != ids(2L))
    // The FULL 64-bit seed must matter: seeds differing only above bit
    // 30 (e.g. derived from 64-bit run-id hashes) and negative seeds
    // must draw different samples — a bare 31-bit mask collapsed them.
    assert(ids(0L) != ids(1L << 31))
    assert(ids(5L) != ids(5L | (1L << 40)))
    assert(ids(-7L) != ids(-7L & 0x7FFFFFFFL))
  }

  test("survivor sets are monotone in the rate (raising a rate only adds rows)") {
    // bucket(key) is fixed per row; only the threshold moves — so the
    // 0.2-rate survivors must be a strict subset of the 0.6-rate ones.
    def ids(rate: Double) =
      Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> rate))
        .filter(col("lang") === "en")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val (lo, hi) = (ids(0.2), ids(0.6))
    assert(lo.subsetOf(hi) && lo.size < hi.size)
  }

  test("thresholds round rather than truncate (0.0003 keeps 3 buckets, not 2)") {
    // 0.0003 * 10000 = 2.9999999999999996 in double — truncation loses a
    // bucket (33% shortfall at this rate); rounding restores the contract.
    val t = docs.filter(col("lang") === "en").limit(1)
      .select(Sampling.keepThreshold("lang", Map("en" -> 0.0003)).as("t"))
      .head().getLong(0)
    assert(t == 3L)
  }

  test("strided key sets sample near the configured rate (xor-mix regression)") {
    // Interleaved shards assign every-Nth id to a source — exactly the
    // key shape that collapsed the old pure-multiplicative hash into a
    // narrow bucket band (a 58% rate kept 94% of one stride and 0% of
    // another, r5). The xor-shifts break the affine lattice.
    import org.apache.spark.sql.Row
    for (stride <- Seq(7L, 20L, 100L)) {
      val rows = (0L until 400L).map(i => Row(1L + i * stride, "s"))
      val d = df(rows, "doc_id BIGINT, src STRING")
      val kept = Sampling.stratifiedSample(d, "doc_id", "src", Map("s" -> 0.5))
        .count()
      assert(math.abs(kept / 400.0 - 0.5) < 0.12,
        s"stride $stride: kept ${kept}/400 at rate 0.5")
    }
  }

  test("Spark hash matches the reference restatement across the 63-bit key range") {
    // 64-bit hash-derived doc ids are the norm at 100 TB; the r5
    // single-multiply hash overflowed (loud ANSI throw) past ~3.4e9.
    // The split-key form must agree with the documented formula — and
    // not throw — from 0 through Long.MaxValue.
    import org.apache.spark.sql.Row
    val keys = Seq(0L, 1L, 41L, Int.MaxValue.toLong, 1L << 31,
      (1L << 42) + 12345L, (1L << 62) - 1L, 1L << 62,
      Long.MaxValue - 1L, Long.MaxValue) ++
      (0 until 100).map(i => (1L << 55) + i * 104729L)
    val d = df(keys.map(Row(_)), "k BIGINT")
    val got = d.select(col("k"), Sampling.hash64(col("k"), 7L).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach(k => assert(got(k) == RefHash.hash64(k, 7L), s"key $k"))
    // Key bit 62 reaches the hash, not silently masked off.
    assert(RefHash.hash64(1L << 62, 7L) != RefHash.hash64(0L, 7L))
    // And the ORDER-grade wrap-mix agrees with its restatement over the
    // same key range, stays non-negative, and fits under 2^62 (so every
    // oracle-side intermediate is exact BIGINT arithmetic).
    val gotOrder = d.select(col("k"), Sampling.orderKey(col("k"), 7L).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val ref = RefHash.orderKey(k, 7L)
      assert(gotOrder(k) == ref, s"orderKey key $k")
      assert(ref >= 0L && ref < (1L << 62), s"orderKey range key $k")
    }
  }

  test("no seed-independent collision family across the 2^62 boundary") {
    // An earlier split-key form folded key bit 62 into bit 31 BEFORE the
    // seed entered, making hash64(2^31 + c) == hash64(2^62 + c) for
    // every c at EVERY seed — pairs of hash-derived doc ids that always
    // shared a bucket, split, and training-order position, un-fixable by
    // salting. The whole-lane form must not collide on that family (or
    // its generalization) at any probed seed.
    for (seed <- Seq(7L, 42L, 999L, 0x4D495853L); c <- 0L until 50L) {
      assert(RefHash.hash64((1L << 31) + c, seed) !=
        RefHash.hash64((1L << 62) + c, seed), s"c=$c seed=$seed")
      assert(RefHash.hash64(c, seed) !=
        RefHash.hash64((1L << 62) + (3L << 31) + c, seed), s"xor-family c=$c")
    }
  }

  test("hash64 output width is ~2^62, not 2^31 (no birthday collisions at 200k keys)") {
    // ADVICE r6: the earlier combine xor'd the two 31-bit lane mixes
    // BEFORE the final multiply, so the whole hash took at most 2^31
    // distinct values — 200k keys would produce ~9 expected birthday
    // collisions and, at multi-billion docs, many small doc_id-ordered
    // tie groups in trainingOrder. The fix keeps the LOW lane injective
    // end to end (g1 unmasked; h3 = xor(g1, g2*Knuth) is a bijection of
    // g1 for fixed k1), so same-block keys cannot collide AT ALL and
    // cross-block collisions need an xor coincidence at ~2^-62 per pair:
    // expected collisions here are ~1e-8, so ANY collision fails. Mixed
    // key shapes — dense, strided, and high-range — at two seeds.
    for (seed <- Seq(7L, 42L)) {
      val keys = (0L until 100000L) ++
        (0L until 50000L).map(i => (1L << 40) + i * 104729L) ++
        (0L until 50000L).map(i => (1L << 61) + i * 7919L)
      val hashes = keys.map(k => RefHash.hash64(k, seed))
      assert(hashes.distinct.size == keys.size,
        s"seed $seed: ${keys.size - hashes.distinct.size} collisions in ${keys.size} keys")
      // The ORDER-grade wrap-mix keeps the width: it drops only hash
      // bit 31, so collisions need a ~2^-62 coincidence — expected
      // ~1e-8 over these 200k keys, so ANY collision fails.
      val orders = keys.map(k => RefHash.orderKey(k, seed))
      assert(orders.distinct.size == keys.size,
        s"seed $seed: orderKey collisions (width regressed)")
    }
  }

  test("strided keys near 2^62 still sample near the configured rate") {
    // The xor-mix uniformity argument re-proven at the top of the key
    // range: high-magnitude ids with a coarse stride (the shape of
    // hash-derived ids partitioned across shards).
    import org.apache.spark.sql.Row
    for (stride <- Seq(1001L, 1L << 33)) {
      val base = (1L << 62) - 400L * stride
      val rows = (0L until 400L).map(i => Row(base + i * stride, "s"))
      val d = df(rows, "doc_id BIGINT, src STRING")
      val kept = Sampling.stratifiedSample(d, "doc_id", "src", Map("s" -> 0.5))
        .count()
      assert(math.abs(kept / 400.0 - 0.5) < 0.12,
        s"stride $stride at 2^62: kept $kept/400 at rate 0.5")
    }
  }

  test("composed sample→split at the same seed still lands every split") {
    // ADVICE r5: with one unsalted hash, sampling at rate r keeps only
    // buckets below r·10⁴, so a subsequent split would route EVERY
    // survivor to the first band — val/test silently empty. The
    // per-purpose salts decorrelate the two selections.
    val survivors = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.5)
    val bands = Sampling.splitSummary(survivors, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bands.getOrElse("val", 0L) > 0 && bands.getOrElse("test", 0L) > 0,
      s"correlated selections: $bands")
  }

  test("splits are disjoint, exhaustive, and partitioning-invariant") {
    import graft.ext.Sampling.assignSplit
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def splitsOf(parts: Int): Map[Long, String] =
      docs.repartition(parts)
        .select(col("doc_id"), assignSplit(col("doc_id"), fr).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splitsOf(2)
    assert(a == splitsOf(13), "assignment must not depend on partitioning")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")),
      "fractions summing to 1 leave no holdout")
    val byS = a.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = a.size.toDouble
    assert(math.abs(byS("train") / n - 0.8) < 0.1, byS.toString)
    assert(byS.getOrElse("val", 0) > 0 && byS.getOrElse("test", 0) > 0)
  }

  test("split fractions below 1 route the remainder to the holdout label") {
    import graft.ext.Sampling.assignSplit
    val out = docs.select(assignSplit(col("doc_id"),
        Seq("train" -> 0.5), otherwise = "rest").as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("train", "rest"))
    assert(out.values.sum == docs.count())
  }

  test("bad split specs are rejected") {
    import graft.ext.Sampling.assignSplit
    intercept[IllegalArgumentException](
      assignSplit(col("k"), Seq("a" -> 0.6, "b" -> 0.6)))
    intercept[IllegalArgumentException](
      assignSplit(col("k"), Seq("a" -> 0.5, "a" -> 0.2)))
    intercept[IllegalArgumentException](
      assignSplit(col("k"), Seq("holdout" -> 0.5)))
    intercept[IllegalArgumentException](assignSplit(col("k"), Seq.empty))
  }

  test("out-of-range rates are rejected") {
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.5)))
  }

  test("group-preserving split: no group straddles, the row-keyed " +
       "split provably would, null groups share one split") {
    import org.apache.spark.sql.Row
    val rows = (0L until 4000L).map(i =>
      Row(i, if (i % 100 == 7) null else s"g${i % 80}"))
    val docs = df(rows, "doc_id BIGINT, grp STRING")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val byGroup = docs.withColumn("split",
      Sampling.assignSplitByGroup(col("grp"), fr))
    val straddling = byGroup.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddling == 0L, "a group straddled splits — leakage")
    // Null groups collapse to ONE split (the '' group), never dropped.
    val nullSplits = byGroup.filter(col("grp").isNull)
      .select("split").distinct().count()
    assert(nullSplits == 1L)
    // The row-keyed split on the same data DOES straddle — the
    // contrast that makes the group variant worth shipping.
    val byRow = docs.withColumn("split",
      Sampling.assignSplit(col("doc_id"), fr))
    val rowStraddle = byRow.filter(col("grp").isNotNull)
      .groupBy("grp").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(rowStraddle > 0L,
      "fixture too small to show the leakage the guard prevents")
  }
}
