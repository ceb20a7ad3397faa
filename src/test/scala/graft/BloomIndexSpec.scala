package graft

import org.apache.spark.sql.functions._

import graft.ext.{BloomIndex, Dedup}

class BloomIndexSpec extends SparkSpec {

  private def corpus = Tables.documents(spark, sfDir)

  private def shardAndHistory = {
    val docs = corpus
    val history = docs.filter(col("doc_id") < 300)
    val shard = docs.filter(col("doc_id") >= 300)
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 10000))
    (shard, Dedup.fingerprints(history).localCheckpoint(true))
  }

  test("no false negatives: every history key is bloom-positive") {
    val (_, historyFp) = shardAndHistory
    val bloom = BloomIndex.build(historyFp, expectedItems = 1000L, fpp = 0.03)
    val misses = historyFp
      .filter(!BloomIndex.mightContain(bloom, col("fp"))).count()
    assert(misses == 0)
  }

  test("bloom-gated dedup equals the plain anti join, across sketch sizes") {
    val (shard, historyFp) = shardAndHistory
    val plain = Dedup.exactDedupAgainst(shard, historyFp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Well-sized, deliberately undersized (high fpp — everything
    // funnels to the verify join), and oversized sketches must all be
    // result-invisible.
    for ((n, fpp) <- Seq((1000L, 0.01), (10L, 0.5), (100000L, 0.001))) {
      val bloom = BloomIndex.build(historyFp, expectedItems = n, fpp = fpp)
      val gated = Dedup.exactDedupAgainstBloom(shard, historyFp, bloom)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(gated == plain, s"mismatch at n=$n fpp=$fpp")
    }
  }

  test("bloom-gated KEEPER dedup equals its plain anti join, across sketch sizes") {
    import org.apache.spark.sql.functions.{col, length}
    val (shard, historyFp) = shardAndHistory
    val q = length(col("text"))
    val plain = Dedup.exactDedupKeepBestAgainst(shard, historyFp, q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for ((n, fpp) <- Seq((1000L, 0.01), (10L, 0.5), (100000L, 0.001))) {
      val bloom = BloomIndex.build(historyFp, expectedItems = n, fpp = fpp)
      val gated = Dedup.exactDedupKeepBestAgainstBloom(shard, historyFp, bloom, q)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(gated == plain, s"keeper mismatch at n=$n fpp=$fpp")
    }
    assert(plain.nonEmpty, "fixture must leave keeper survivors")
  }

  test("planted history copies drop; the pass-through lane actually prunes") {
    val (shard, historyFp) = shardAndHistory
    val bloom = BloomIndex.build(historyFp, expectedItems = 1000L, fpp = 0.01)
    val survivors = Dedup.exactDedupAgainstBloom(shard, historyFp, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    (10000L until 10010L).foreach(id => assert(!survivors.contains(id)))
    // The probe filter must route a substantial bloom-negative fraction
    // around the join (distinct shard texts absent from history): at
    // fpp 1% virtually all genuinely-new fingerprints test negative.
    val deduped = Dedup.exactDedup(shard)
      .withColumn("__fp", Dedup.fingerprintOf(col("text")))
    val negatives = deduped
      .filter(!BloomIndex.mightContain(bloom, col("__fp"))).count()
    assert(negatives > 0, "pre-filter never pruned — the lane is vacuous")
  }

  test("empty history: all-negative sketch, everything survives intact") {
    val (shard, historyFp) = shardAndHistory
    val empty = historyFp.filter(lit(false)).localCheckpoint(true)
    val bloom = BloomIndex.build(empty, expectedItems = 100L, fpp = 0.01)
    val gated = Dedup.exactDedupAgainstBloom(shard, empty, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = Dedup.exactDedup(shard)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated == plain)
  }

  test("the two lanes share ONE dedup shuffle at runtime (AQE ReusedExchange)") {
    val (shard, historyFp) = shardAndHistory
    val bloom = BloomIndex.build(historyFp, expectedItems = 1000L, fpp = 0.05)
    val out = Dedup.exactDedupAgainstBloom(shard, historyFp, bloom)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // The static plan carries two copies of the intra-shard dedup
    // aggregate (one per bloom branch); the FINAL adaptive plan must
    // materialize the exchange once and re-read it — otherwise the
    // gated path would shuffle the shard twice and be strictly worse
    // than the plain anti join at scale.
    assert(plan.contains("ReusedExchange"),
      "bloom branches did not reuse the dedup exchange:\n" + plan.take(2000))
    // Constraint propagation must carry the probe onto the history
    // build side: the anti join's hash relation holds only
    // bloom-positive history keys.
    // Diagnose a missing broadcast join distinctly from a lost
    // predicate — split(...)(1) on a broadcast-free plan would be an
    // uninformative ArrayIndexOutOfBounds.
    assert(plan.contains("BroadcastExchange"),
      "history anti join was not planned as broadcast:\n" + plan.take(2000))
    val buildSide = plan.split("BroadcastExchange", 2)(1)
    assert(buildSide.contains("might_contain"),
      "history build side lost the propagated bloom predicate")
  }

  test("null-text rows survive both lanes (anti-join null semantics)") {
    val docs = df(Seq(
        org.apache.spark.sql.Row(1L, "alpha beta gamma"),
        org.apache.spark.sql.Row(2L, null),
        org.apache.spark.sql.Row(3L, null)),
      "doc_id BIGINT, text STRING")
    val historyFp = Dedup.fingerprints(
      df(Seq(org.apache.spark.sql.Row(9L, "alpha beta gamma")),
        "doc_id BIGINT, text STRING")).localCheckpoint(true)
    val bloom = BloomIndex.build(historyFp, expectedItems = 10L, fpp = 0.01)
    val out = Dedup.exactDedupAgainstBloom(docs, historyFp, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 duplicates history (drops); null-text rows dedup to one
    // intra-shard survivor (min key) that no history key can match.
    assert(out == Set(2L))
  }
}
