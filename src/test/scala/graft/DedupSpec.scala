package graft

import graft.ext.Dedup
import org.apache.spark.sql.Row

/** X1 dedup operators: exact keep-first, shingling, exact Jaccard pairs,
  * and the MinHash/SimHash fuzzy paths (recall asserted against the exact
  * Jaccard ground truth — the LSH families are randomized-by-seed, so
  * their guarantee is probabilistic, pinned here by fixed seeds). */
class DedupSpec extends SparkSpec {

  private val docs = df(Seq(
    Row(1L, "the quick brown fox jumps over the lazy dog"),
    Row(2L, "  The   quick brown fox jumps over the lazy dog "), // exact dup modulo norm
    Row(3L, "the quick brown fox jumps over the lazy cat"),      // near dup of 1
    Row(4L, "completely different content about spark engines"),
    Row(5L, "the quick brown fox jumps over the lazy dog")),     // exact dup of 1
    "doc_id BIGINT, text STRING")

  test("exactDedup keeps the lowest key per normalized text") {
    val kept = Dedup.exactDedup(docs).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L)) // 2 and 5 collapse into 1
  }

  test("exactDedupKeepBest: max quality wins, ties to min key, null floor") {
    import org.apache.spark.sql.functions.{col, length}
    val corpus = df(Seq(
      Row(1L, "the quick brown fox"),
      Row(2L, "  The   quick BROWN fox "), // norm-equal to 1, raw-LONGER
      Row(3L, "the quick brown fox"),      // norm-equal to 1, same length as 1
      Row(4L, "unrelated"),
      Row(5L, null), Row(6L, null)),       // null family: both floor quality
      "doc_id BIGINT, text STRING")
    val kept = Dedup.exactDedupKeepBest(corpus, length(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // family {1,2,3}: 2 is raw-longest; null family {5,6}: tie -> min key 5
    assert(kept == Seq(2L, 4L, 5L))
    // contrast: min-key policy keeps 1, not 2
    assert(Dedup.exactDedup(corpus).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L, 5L))
  }

  test("exactDedupKeepBest orders quality on the NATIVE type past 2^53") {
    import org.apache.spark.sql.functions.col
    // Two BIGINT qualities above 2^53 differing by 1: a double-cast
    // ordering would see them equal and fall to the min-key tie-break
    // (keeping 1); the native ordering must keep the larger (2).
    val corpus = df(Seq(
        Row(1L, "same text", 9007199254740992L),
        Row(2L, "same text", 9007199254740993L)),
      "doc_id BIGINT, text STRING, q BIGINT")
    val kept = Dedup.exactDedupKeepBest(corpus, col("q"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L), "2^53-adjacent BIGINT qualities must compare exactly")
  }

  test("exactDedupKeepBestAgainst: merit wins intra-shard, history wins always") {
    import org.apache.spark.sql.functions.{col, length}
    val history = df(Seq(Row(100L, "alpha beta gamma")),
      "doc_id BIGINT, text STRING")
    val shard = df(Seq(
        Row(1L, "delta epsilon"),
        Row(2L, "  delta   EPSILON  "),        // norm-equal to 1, raw-longer → wins
        Row(3L, "  alpha beta GAMMA   padded"),// unrelated survivor
        Row(4L, " alpha  beta gamma "),        // higher quality than history copy…
        Row(5L, null)),                        // null fp → anti join keeps
      "doc_id BIGINT, text STRING")
    val kept = Dedup.exactDedupKeepBestAgainst(
        shard, Dedup.fingerprints(history), length(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 2 beats 1 on merit; 4 wins its (singleton) family but drops vs
    // history UNCONDITIONALLY despite more raw characters; 3 is a
    // different norm (extra token) and survives; null-text 5 survives
    // (null fingerprint matches nothing — the X1h contract).
    assert(kept == Seq(2L, 3L, 5L))
  }

  test("softDedupWeights: family sizes, floor weights, norm equivalence") {
    val out = Dedup.softDedupWeights(docs)
      .select("doc_id", "soft_dup_count", "soft_weight_ppm")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.size == 5, "every copy is KEPT — soft dedup drops nothing")
    assert(out(1L) == ((3L, 333333L))) // 1, 2 (norm-equal), 5
    assert(out(2L) == ((3L, 333333L)))
    assert(out(5L) == ((3L, 333333L)))
    assert(out(3L) == ((1L, 1000000L)))
    assert(out(4L) == ((1L, 1000000L)))
  }

  test("softDedupWeights: null texts form ONE family (exactDedup classes)") {
    val withNulls = df(Seq(
        Row(1L, "alpha"), Row(2L, null), Row(3L, null), Row(4L, null)),
      "doc_id BIGINT, text STRING")
    val out = Dedup.softDedupWeights(withNulls)
      .select("doc_id", "soft_dup_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // parity: the family count equals what hard dedup would keep
    assert(Dedup.exactDedup(withNulls).count() == 2L)
  }

  test("softDedupWeights: family mass lands in (1e6 - n, 1e6]") {
    val mass = Dedup.softDedupWeights(docs)
      .groupBy("soft_dup_count").agg(
        org.apache.spark.sql.functions.sum("soft_weight_ppm").as("m"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
      .collect()
    mass.foreach { r =>
      val (n, m, rows) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val families = rows / n
      assert(m > families * (1000000L - n) && m <= families * 1000000L,
        s"family mass $m out of bounds for n=$n over $families families")
    }
  }

  test("wordShingles emits distinct consecutive n-grams") {
    val grams = Dedup.wordShingles(docs.filter("doc_id = 1"), n = 3)
      .collect().map(_.getString(1)).toSet
    assert(grams.contains("the quick brown"))
    assert(grams.contains("over the lazy"))
    assert(grams.size == 7) // 9 tokens → 7 trigrams, all distinct
  }

  test("wordShingles of a doc shorter than n is empty") {
    val tiny = df(Seq(Row(1L, "too short")), "doc_id BIGINT, text STRING")
    assert(Dedup.wordShingles(tiny, n = 3).count() == 0)
  }

  test("jaccardPairs: identical docs score 1.0, near-dups high, unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, n = 3, minSim = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs((2L, 5L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccardPairs maxDocFreq drops stop-shingles from candidates") {
    // With the hot shingle capped out, docs 1/2/5 still pair via their
    // remaining shared shingles (all identical → jaccard of the kept sets
    // is still 1.0), and the pair set can only shrink.
    val un = Dedup.jaccardPairs(docs, n = 3, minSim = 0.5)
    val capped = Dedup.jaccardPairs(docs, n = 3, minSim = 0.5, maxDocFreq = Some(2))
    val unPairs = un.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capPairs.subsetOf(unPairs))
  }

  test("exactDedupAgainst: history collisions drop, shard-unique and null-text keep") {
    val history = df(Seq(
      Row(1L, "seen before text"),
      Row(2L, "another old document")),
      "doc_id BIGINT, text STRING")
    val shard = df(Seq(
      Row(10L, "Seen  Before text"),     // history dup modulo normalization
      Row(11L, "brand new content"),     // survives
      Row(12L, "brand NEW content"),     // intra-shard dup of 11 (loses min-key)
      Row(13L, "another old document"),  // history dup
      Row(14L, null)),                   // null text: anti-join keeps it
      "doc_id BIGINT, text STRING")
    val kept = Dedup.exactDedupAgainst(shard, Dedup.fingerprints(history))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 14L), s"got $kept")
  }

  test("minhashPairsAgainst: cross-shard recall vs exact Jaccard ground truth") {
    import org.apache.spark.sql.functions.col
    val documents = Tables.documents(spark, sfDir)
    val history = documents.filter("doc_id < 250")
    // Tomorrow's shard: re-keyed copies of 30 history docs (cross-shard
    // exact dups) plus 20 genuinely new docs history has never seen.
    val shard = documents.filter("doc_id < 30")
      .withColumn("doc_id", col("doc_id") + 10000)
      .unionByName(documents.filter("doc_id >= 250 AND doc_id < 270"))
    val cross = Dedup.minhashPairsAgainst(shard,
        Dedup.minhashSignatures(history, n = 4), n = 4, bands = 8, minSim = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Ground truth: exact-Jaccard pairs over history ∪ shard with exactly
    // one side in the shard (every shard id >= 250, every history id < 250).
    val exact = Dedup.jaccardPairs(history.unionByName(shard), n = 4, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a >= 250) != (b >= 250) }
      .map { case (a, b) => if (a >= 250) (a, b) else (b, a) }.toSet
    assert(exact.size >= 30, s"fixture must contain cross-shard dups (${exact.size})")
    assert(exact.subsetOf(cross),
      s"incremental MinHash missed ${(exact -- cross).size} of ${exact.size} true pairs")
    // And the keep-history drop set covers every planted re-keyed copy.
    val drops = cross.map(_._1)
    assert((0L until 30L).map(_ + 10000L).toSet.subsetOf(drops))
  }

  test("simhashPairsAgainst: cross-shard recall vs the uncapped self-join truth") {
    import org.apache.spark.sql.functions.col
    val documents = Tables.documents(spark, sfDir)
    val history = documents.filter("doc_id < 250")
    val shard = documents.filter("doc_id < 30")
      .withColumn("doc_id", col("doc_id") + 10000)
      .unionByName(documents.filter("doc_id >= 250 AND doc_id < 270"))
    val cross = Dedup.simhashPairsAgainst(shard,
        Dedup.simhashSignatures(history, n = 4), n = 4, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Every re-keyed exact copy collides with its original at hamming 0.
    val planted = (0L until 30L).map(i => (i + 10000L, i)).toSet
    assert(planted.subsetOf(cross),
      s"missed planted copies: ${planted -- cross}")
    // Ground truth: the self-join over history ∪ shard, restricted to
    // cross-side pairs — the incremental path must find the same set.
    val full = Dedup.simhashPairs(history.unionByName(shard), n = 4, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a >= 250) != (b >= 250) }
      .map { case (a, b) => if (a >= 250) (a, b) else (b, a) }.toSet
    assert(full == cross, s"asymmetric: ${(full -- cross)} / ${(cross -- full)}")
  }

  test("minhashPairs recovers every exact-Jaccard pair on testdata (planted dups)") {
    val documents = Tables.documents(spark, sfDir)
    val exact = Dedup.jaccardPairs(documents, n = 4, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fuzzy = Dedup.minhashPairs(documents, n = 4, bands = 8, minSim = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
    assert(exact.subsetOf(fuzzy),
      s"MinHash-LSH missed ${(exact -- fuzzy).size} of ${exact.size} true pairs")
  }

  test("minhash signature estimates Jaccard within tolerance") {
    val sigs = Dedup.minhashSignatures(docs, n = 3, numHashes = 128)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 128.0
    // True trigram Jaccard of docs 1 and 3 is 6/8 = 0.75.
    assert(math.abs(est13 - 0.75) < 0.15, s"estimate $est13 too far from 0.75")
    assert(sigs(1L) == sigs(5L)) // identical docs → identical signatures
  }

  test("simhashPairs finds identical and near-identical docs, skips unrelated") {
    val pairs = Dedup.simhashPairs(docs, n = 3, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash of identical content is identical") {
    val sigs = Dedup.simhashSignatures(docs, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(5L))
    assert(sigs(1L) != sigs(4L))
  }

  // ---------------------------------------------------- LSH bucket caps
  // The banded operators' guard against the quadratic hot-bucket cliff:
  // a bucket of m members emits ~m²/2 candidates, so low-diversity
  // corpora need a hard per-bucket bound (recall trade-off documented on
  // capLshBuckets). The planted near-dups in the driver testdata are the
  // recall fixture: a TIGHT cap must not lose them, because true
  // near-dups also collide in small, discriminative buckets.

  test("capLshBuckets enforces the bound and only shrinks candidate volume") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max => smax, sum}
    val documents = Tables.documents(spark, sfDir)
    val buckets = Dedup.lshBuckets(
      Dedup.minhashSignatures(documents, n = 4), numHashes = 64, bands = 8)
    def stats(b: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = b.groupBy("band", "bucket").agg(count(lit(1)).as("m"))
        .agg(smax("m"), sum(expr("m * (m - 1) DIV 2"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (rawMax, rawVolume) = stats(buckets)
    assert(rawMax > 2, "fixture should contain buckets above the test cap")
    val (capMax, capVolume) = stats(Dedup.capLshBuckets(buckets, Some(2)))
    assert(capMax <= 2, s"surviving bucket of size $capMax exceeds the cap")
    assert(capVolume < rawVolume,
      s"cap did not reduce candidate volume ($capVolume vs $rawVolume)")
    assertThrows[IllegalArgumentException](
      Dedup.capLshBuckets(buckets, Some(1)))
  }

  test("minhashPairs under a tight bucket cap keeps full planted recall") {
    val documents = Tables.documents(spark, sfDir)
    val exact = Dedup.jaccardPairs(documents, n = 4, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.minhashPairs(documents, n = 4, bands = 8, minSim = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashPairs(documents, n = 4, bands = 8, minSim = 0.7,
        maxBucketSize = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && exact.subsetOf(capped),
      s"cap lost ${(exact -- capped).size} of ${exact.size} true pairs")
    assert(capped.subsetOf(uncapped), "a cap can only shrink the pair set")
  }

  test("simhashPairs under a tight bucket cap keeps every uncapped pair") {
    val documents = Tables.documents(spark, sfDir)
    val uncapped = Dedup.simhashPairs(documents, n = 4, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.simhashPairs(documents, n = 4, maxHamming = 6,
        maxBucketSize = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.nonEmpty)
    // Near-identical signatures collide in SMALL buckets too (their band
    // values are shared, discriminative slices); the hot buckets a cap
    // drops hold unrelated low-entropy collisions on this corpus.
    assert(capped == uncapped,
      s"cap lost ${(uncapped -- capped).size} of ${uncapped.size} pairs")
  }

  test("contaminationPairs flags verbatim and embedded benchmark quotes, not clean docs") {
    import org.apache.spark.sql.Row
    val corpus = df(Seq(
      Row(10L, "alpha beta gamma delta epsilon zeta eta theta"),
      // quotes ALL of bench doc 0 inside a longer doc: containment 1.0
      // with tiny Jaccard — the case containment (not Jaccard) exists for
      Row(11L, "intro words alpha beta gamma delta epsilon zeta eta theta outro trailer"),
      Row(12L, "totally unrelated content with other words entirely present"),
      // shares only a prefix of bench 0 → containment 1/5 < 0.8
      Row(13L, "alpha beta gamma delta unrelated tail here now")),
      "doc_id BIGINT, text STRING")
    val bench = df(Seq(
      Row(0L, "alpha beta gamma delta epsilon zeta eta theta")),
      "bench_id BIGINT, text STRING")
    val pairs = Dedup.contaminationPairs(corpus, bench, n = 4,
        minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(pairs.keySet == Set(10L, 11L))
    assert(pairs(10L) == 1.0 && pairs(11L) == 1.0)
  }

  // -------------------------------------------- hammingEdges (VERDICT r14 #1)
  // The verdict-sufficient edge relation: same components and drop set
  // as the full pair relation, LINEAR in identical-signature family
  // size where hammingPairs' Hamming-0 self-join is quadratic.

  /** A signature corpus with a LARGE Hamming-0 family (ids 0..n-1 share
    * one signature), a second family at Hamming 1 from it, a small
    * third family at Hamming 2 from the second, and an unrelated
    * far-off signature. */
  private def plantedSigs(bigFamily: Int) = {
    val base = 0x5a5a5a5a5a5a5a5aL
    val rows =
      (0L until bigFamily.toLong).map(i => Row(i, base)) ++          // family A
      Seq(Row(9001L, base ^ 1L), Row(9002L, base ^ 1L),              // family B (d=1 from A)
        Row(9003L, base ^ 6L),                                       // family C (d=2 from A, d=3 from B)
        Row(9100L, ~base))                                           // isolated
    df(rows, "doc_id BIGINT, sig BIGINT")
  }

  test("hammingEdges is linear in identical-signature family size") {
    val n = 1200
    val edges = Dedup.hammingEdges(plantedSigs(n), "doc_id", "sig",
      maxHamming = 3)
    val m = edges.count()
    // star edges: (n-1) for family A, 1 for B, 0 for C/isolated;
    // representative edges: A-B (d=1), B-C (d=2), A-C (d=3) = 3.
    assert(m == (n - 1) + 1 + 3,
      s"expected ${(n - 1) + 4} linear edges, got $m (quadratic would be " +
        s"~${n.toLong * (n - 1) / 2})")
  }

  test("hammingEdges: components and keep-first drop set equal hammingPairs'") {
    val sigs = plantedSigs(40)
    val pairs = Dedup.hammingPairs(sigs, "doc_id", "sig", maxHamming = 3)
    val edges = Dedup.hammingEdges(sigs, "doc_id", "sig", maxHamming = 3)
    def components(rel: org.apache.spark.sql.DataFrame) =
      graft.ext.DedupResolve.connectedComponents(rel)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(components(edges) == components(pairs),
      "edge relation must span the identical connected components")
    def dropSet(rel: org.apache.spark.sql.DataFrame) =
      rel.select("doc_id_b").distinct().collect().map(_.getLong(0)).toSet
    assert(dropSet(edges) == dropSet(pairs),
      "DISTINCT doc_id_b must yield the identical keep-first drop set")
    // the planted truth: everything except the global min (0) and the
    // isolated image is dropped (A/B/C are one component rooted at 0).
    assert(dropSet(edges) ==
      ((1L until 40L).toSet ++ Set(9001L, 9002L, 9003L)))
  }

  test("hammingPairs/hammingEdges reject a non-integral signature column") {
    val bad = df(Seq(Row(1L, "notasig")), "doc_id BIGINT, sig STRING")
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs(bad, "doc_id", "sig", maxHamming = 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingEdges(bad, "doc_id", "sig", maxHamming = 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingPairsAgainst(bad, bad, "doc_id", "sig", maxHamming = 3)
    }
  }
}
