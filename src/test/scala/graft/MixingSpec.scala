package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Mixing, Sampling}

class MixingSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) =
    df(rows.map { case (id, src, t) => Row(id, src, t) },
      "doc_id BIGINT, source STRING, text STRING")

  /** Mixing selects with the MIX-salted seed ([[RefHash]] restates the
    * documented split-key formula independently of the Spark side). */
  private def refBucket(id: Long, seed: Long = 42L): Long =
    RefHash.bucket(id, seed ^ Sampling.MixSalt)

  test("sourceTotals counts docs and whitespace tokens per source") {
    val d = docs((1L, "a", "one two three"), (2L, "a", "four"), (3L, "b", "x y"))
    val t = Mixing.sourceTotals(d).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(t.toSeq == Seq(("a", 2L, 4L), ("b", 1L, 2L)))
  }

  test("undersupplied source caps at rate 1.0 and keeps everything") {
    val d = docs((1L, "a", "t1 t2"), (2L, "b", "t3 t4"))
    // a's target = 100 tokens >> 2 supplied -> rate 1; b weight 0 -> dropped.
    val kept = Mixing.mixToBudget(d, weights = Map("a" -> 1.0), totalTokens = 100L)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("fractional rate selects the same survivors on any partitioning") {
    val d = docs((1L to 200L).map(i => (i, "a", s"tok$i word$i")): _*)
    val w = Map("a" -> 1.0)
    val a = Mixing.mixToBudget(d, weights = w, totalTokens = 100L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Mixing.mixToBudget(d.repartition(13), weights = w, totalTokens = 100L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty && a.size < 200,
      s"expected a stable strict subset, got ${a.size}")
  }

  test("mixSummary reports all three regimes and zero-weight sources") {
    val sf = Tables.documents(spark, sfDir)
    val out = Queries.x12TokenMix(spark, sfDir).collect()
    assert(out.length == sf.select("source").distinct().count())
    val bySrc = out.map(r => r.getString(0) -> r).toMap
    // src0: target 1500 vs its supply — capped or fractional, never over.
    val s0 = bySrc("src0")
    assert(s0.getLong(4) <= s0.getLong(1) && s0.getLong(5) <= s0.getLong(2))
    // weight-0 source keeps nothing.
    val s9 = bySrc("src9")
    assert(s9.getLong(3) == 0L && s9.getLong(4) == 0L && s9.getLong(5) == 0L)
    // fractional source lands within 25% of target (hash-rate variance on
    // ~25 docs is wide; the point is the rate machinery, not tight bounds).
    val s1 = bySrc("src1")
    assert(s1.getLong(5) > 0L && math.abs(s1.getLong(5) - s1.getLong(3)) <=
      (s1.getLong(3) * 0.25).toLong + 200,
      s"src1 achieved ${s1.getLong(5)} vs target ${s1.getLong(3)}")
  }

  test("mix keeps exactly the rows under the per-source threshold") {
    val d = docs((1L to 50L).map(i => (i, "a", "w1 w2 w3 w4")): _*)
    val total = 200L // 50 docs * 4 tokens = 200 supplied; target 100 -> rate .5
    val kept = Mixing.mixToBudget(d, weights = Map("a" -> 0.5), totalTokens = total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (1L to 50L).filter(refBucket(_) < 5000L).toSet
    assert(kept == expected)
  }

  test("trainingOrder is a total deterministic order, partitioning-invariant") {
    val d = docs((1L to 100L).map(i => (i, "a", "t")): _*)
    val o1 = Mixing.trainingOrder(d).select("doc_id").collect().map(_.getLong(0)).toSeq
    val o2 = Mixing.trainingOrder(d.repartition(17)).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(o1 == o2 && o1.toSet == (1L to 100L).toSet)
    // The order is the hash order, not the key order.
    assert(o1 != (1L to 100L).toSeq)
    // And it replays the documented FULL-WIDTH order-salted formula —
    // not the 10^4-valued bucket, whose tie groups would preserve long
    // id-order runs at scale.
    val manual = (1L to 100L).sortBy(id =>
      (RefHash.orderKey(id, 42L ^ Sampling.OrderSalt), id))
    assert(o1 == manual)
  }

  test("trainingOrder actually shuffles: dense-id adjacency is broken") {
    // The defect the orderKey wrap-mix fixes: raw hash64's low lane is
    // m*Knuth with NO modular wrap — order-preserving in the key — so
    // sorting a dense id block by it kept ~92% of adjacent id pairs
    // adjacent (same-crawl docs glued together in every training
    // batch, a shuffle in name only). Pin both sides: the defect is
    // real for raw hash64, and orderKey breaks it.
    val n = 20000L
    val seed = 42L ^ Sampling.OrderSalt
    def adjacency(key: Long => Long): Double = {
      val order = (0L until n).sortBy(id => (key(id), id))
      order.iterator.zip(order.iterator.drop(1))
        .count { case (a, b) => b == a + 1 }.toDouble / (n - 1)
    }
    assert(adjacency(RefHash.hash64(_, seed)) > 0.5,
      "raw hash64 should exhibit the adjacency defect this test documents")
    assert(adjacency(RefHash.orderKey(_, seed)) < 0.01,
      "orderKey order must break dense-id adjacency")
    // And the engine order IS the RefHash.orderKey order (parity at a
    // size where run-preservation would be visible).
    val d = docs((0L until 2000L).map(i => (i, "a", "t")): _*)
    val engine = Mixing.trainingOrder(d).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val expected = (0L until 2000L).sortBy(id =>
      (RefHash.orderKey(id, seed), id))
    assert(engine == expected)
  }

  test("temperature alpha=0 gives uniform targets, alpha=1 proportional") {
    val d = docs(
      (1L, "big", ("w " * 90).trim), (2L, "small", ("w " * 10).trim))
    def targets(alpha: Double): Map[String, Long] =
      Mixing.temperatureTargets(d, alpha = alpha, totalTokens = 1000L)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("target_tokens")).toMap
    val uniform = targets(0.0)
    assert(uniform("big") == 500L && uniform("small") == 500L)
    val natural = targets(1.0)
    assert(natural("big") == 900L && natural("small") == 100L)
    // 0 < alpha < 1 sits between: up-weights the small source.
    val mid = targets(0.5)
    assert(mid("small") > 100L && mid("small") < 500L, mid.toString)
    assert(mid("big") + mid("small") >= 999L) // rounding, not leakage
  }

  test("temperature summary is partitioning-invariant and caps at supply") {
    val d = Tables.documents(spark, sfDir)
    val a = Queries.x12TemperatureMix(spark, sfDir).collect()
    val b = graft.ext.Mixing.temperatureSummary(
      d.repartition(11), alpha = 0.5, totalTokens = 10000L).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("docs_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_in"))
    }
    assert(a.length == d.select("source").distinct().count())
  }

  test("bad temperature inputs are rejected") {
    val d = docs((1L, "a", "t"))
    intercept[IllegalArgumentException] {
      Mixing.temperatureTargets(d, alpha = 1.5, totalTokens = 10L)
    }
    intercept[IllegalArgumentException] {
      Mixing.temperatureTargets(d, alpha = 0.5, totalTokens = 0L)
    }
  }

  test("bad recipe inputs are rejected") {
    val d = docs((1L, "a", "t"))
    intercept[IllegalArgumentException] {
      Mixing.mixToBudget(d, weights = Map("a" -> 1.0), totalTokens = 0L)
    }
    intercept[IllegalArgumentException] {
      Mixing.mixToBudget(d, weights = Map("a" -> -0.1), totalTokens = 10L)
    }
    // Weights are budget shares: summing above 1 silently overshoots the
    // total token budget, so it is rejected at construction.
    intercept[IllegalArgumentException] {
      Mixing.mixToBudget(d, weights = Map("a" -> 0.9, "b" -> 0.9), totalTokens = 10L)
    }
  }

  test("a zero-supply source drops instead of keeping everything") {
    // tokens_in = 0 makes target/supply 0/0 = null, and Spark's least()
    // SKIPS nulls — without the explicit guard the threshold silently
    // became 10000 (keep-all) for a source with a target of 0.
    val d = df(Seq(Row(1L, "a", "   "), Row(2L, "a", null), Row(3L, "b", "x y")),
      "doc_id BIGINT, source STRING, text STRING")
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val kept = Mixing.mixToBudget(d, weights = w, totalTokens = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(2L), s"zero-supply docs kept: $kept")
    val a = Mixing.mixSummary(d, weights = w, totalTokens = 2L)
      .collect().find(_.getString(0) == "a").get
    assert(a.getAs[Long]("tokens_in") == 0L && a.getAs[Long]("docs_kept") == 0L)
  }

  test("weighted mix at weight 10^6 degenerates to the unweighted mix") {
    val d = docs((1L to 200L).map(i => (i, "a", s"tok$i word$i")): _*)
    val w = Map("a" -> 1.0)
    val full = d.withColumn("soft_weight_ppm", lit(1000000L))
    val weighted = Mixing.weightedMixToBudget(full, weights = w, totalTokens = 100L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val plain = Mixing.mixToBudget(d, weights = w, totalTokens = 100L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(weighted == plain && weighted.nonEmpty)
  }

  test("soft-dedup weighted census matches exact-dedup survivors' mass") {
    // A family of n copies at floor(1e6/n) ppm carries the SAME
    // micro-token mass (within n ppm quantization per family) as the one
    // exact-dedup survivor at weight 1e6 — the SoftDedup composition.
    val base = (1L to 30L).map(i => (i, s"src${i % 3}", s"uniq$i text body $i"))
    // 3 extra copies of docs 1-4, each carrying its ORIGINAL's source —
    // a family split across sources would (correctly) split its mass.
    val dups = (1L to 12L).map { i =>
      val j = i % 4 + 1
      (1000L + i, s"src${j % 3}", s"uniq$j text body $j")
    }
    val d = docs(base ++ dups: _*)
    val soft = graft.ext.Dedup.softDedupWeights(d)
    val softCensus = Mixing.weightedSourceTotals(soft).orderBy("source")
      .collect().map(r => r.getString(0) -> r.getDecimal(2).longValue()).toMap
    val hardCensus = Mixing.weightedSourceTotals(
        graft.ext.Dedup.exactDedup(d).withColumn("soft_weight_ppm", lit(1000000L)))
      .orderBy("source").collect()
      .map(r => r.getString(0) -> r.getDecimal(2).longValue()).toMap
    assert(softCensus.keySet == hardCensus.keySet)
    softCensus.foreach { case (src, m) =>
      val h = hardCensus(src)
      assert(math.abs(m - h) <= h / 1000 + 100,
        s"$src: soft mass $m vs hard mass $h — families must carry ~one doc")
    }
  }

  test("weighted mix survivors replay the integer keep predicate") {
    val d = docs((1L to 50L).map(i => (i, "a", "w1 w2 w3 w4")): _*)
    val weighted = d.withColumn("soft_weight_ppm",
      when(col("doc_id") <= 25L, lit(500000L)).otherwise(lit(1000000L)))
    // supply = 25*4*5e5 + 25*4*1e6 = 1.5e8 utok; target 75 tok = 7.5e7 utok
    // -> thr = 5000. Keep iff bucket*1e6 < 5000*wppm.
    val kept = Mixing.weightedMixToBudget(weighted,
        weights = Map("a" -> 1.0), totalTokens = 75L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (1L to 50L).filter { id =>
      val w = if (id <= 25L) 500000L else 1000000L
      refBucket(id) * 1000000L < 5000L * w
    }.toSet
    assert(kept == expected)
    // Down-weighted docs keep at ~half the rate of full-weight docs.
    assert(kept.count(_ <= 25L) < kept.count(_ > 25L))
  }

  test("x12_weighted_mix audit: duplicate families carry ~one doc of mass") {
    val raw = Tables.documents(spark, sfDir)
    val out = Queries.x12WeightedMix(spark, sfDir).collect()
    assert(out.length == raw.select("source").distinct().count())
    // The raw census counts planted copies at full weight; the weighted
    // census must sit strictly below it for sources holding plants, and
    // within quantization of the exact-dedup survivors' mass overall.
    val (h0, s0) = Queries.plantedShard(raw, withSecondCopy = true)
    val hard = Mixing.weightedSourceTotals(
        graft.ext.Dedup.exactDedup(h0.unionByName(s0))
          .withColumn("soft_weight_ppm", lit(1000000L)))
      .collect().map(r => r.getString(0) -> r.getDecimal(2).longValue()).toMap
    out.foreach { r =>
      val (src, utok) = (r.getString(0), r.getLong(2))
      val h = hard(src)
      assert(math.abs(utok - h) <= h / 1000 + 100,
        s"$src: weighted supply $utok vs dedup mass $h")
      assert(r.getAs[Long]("docs_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("utokens_kept") <= utok)
    }
  }

  test("upsample: whole epochs exact, fractional epochs a keyed draw, " +
       "zero drops the source, copies carry distinct scattered order keys") {
    val d = df((1L to 1000L).map(i =>
        Row(i, if (i <= 400) "a" else if (i <= 800) "b" else "c", 10L)),
      "doc_id BIGINT, source STRING, n_chars BIGINT")
    val up = Mixing.upsample(d,
      Map("a" -> 2300000L, "b" -> 500000L, "c" -> 0L))
    val byDoc = up.groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n"), countDistinct("shuffle_key").as("nk"),
        min("epoch_idx").as("mn"), max("epoch_idx").as("mx"))
      .collect()
    assert(!byDoc.exists(_.getString(0) == "c"), "f=0 must drop the source")
    byDoc.filter(_.getString(0) == "a").foreach { r =>
      assert(r.getLong(2) == 2L || r.getLong(2) == 3L, s"a: $r")
      assert(r.getLong(3) == r.getLong(2), "copies must have distinct keys")
      assert(r.getLong(4) == 0L && r.getLong(5) == r.getLong(2) - 1,
        "epoch_idx must be the dense 0..n-1 range")
    }
    byDoc.filter(_.getString(0) == "b").foreach { r =>
      assert(r.getLong(2) == 1L, s"b emits 0 or 1 copies: $r")
    }
    // The fractional draws hit ~their rates (keyed hash, not RNG — the
    // count is EXACT for this fixture, pinned loosely here and exactly
    // by the x12_upsample oracle on the real corpus).
    val aThird = byDoc.count(r => r.getString(0) == "a" && r.getLong(2) == 3L)
    val bKept = byDoc.count(_.getString(0) == "b")
    assert(aThird > 60 && aThird < 180, s"~30% of a gets a 3rd copy: $aThird")
    assert(bKept > 120 && bKept < 280, s"~50% of b survives: $bKept")
    // Partitioning invariance: the copy set is a pure row function.
    val again = Mixing.upsample(d.repartition(17),
        Map("a" -> 2300000L, "b" -> 500000L, "c" -> 0L))
      .select("doc_id", "epoch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val first = up.select("doc_id", "epoch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(again.sameElements(first))
    // Copies of one document scatter: their order keys are not adjacent
    // in the global order (no two copies of a doc rank consecutively).
    val ranked = up.filter(col("source") === "a")
      .select("doc_id", "shuffle_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    val adjacentSameDoc = ranked.sliding(2)
      .count(p => p.length == 2 && p(0)._1 == p(1)._1)
    assert(adjacentSameDoc <= 3,
      s"$adjacentSameDoc adjacent same-doc copy pairs — copies cluster")
  }

  test("blank and null text count 0 tokens in the supply census") {
    val d = df(Seq(Row(1L, "a", "x y"), Row(2L, "a", "   "), Row(3L, "a", null)),
      "doc_id BIGINT, source STRING, text STRING")
    val t = Mixing.sourceTotals(d).collect().head
    assert(t.getAs[Long]("n_docs") == 3L && t.getAs[Long]("tokens_in") == 2L,
      s"blank/null must not inflate the budget accounting: $t")
  }
}
