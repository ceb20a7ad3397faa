package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{SemDedup, Similarity}

class SemDedupSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  /** Base corpus + exact copies of vec_id < n at offset 100000. */
  private def planted(n: Int) = {
    val copies = emb.filter(col("vec_id") < n)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    emb.unionByName(copies)
  }

  test("k=1 degenerates to exact brute force: pair set equals the LSH-free truth") {
    // One cluster → within-cluster = all-pairs, so SemDeDup at k=1 must
    // find exactly the threshold-clearing pairs (here: the planted
    // copies; base corpus maxes at ~0.52).
    val corpus = planted(4)
    val got = SemDedup.pairs(corpus, k = 1, iters = 0, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0 until 4).map(i => (i.toLong, i + 100000L)).toSet)
  }

  test("exact copies are found at ANY k (quantizer is a pure function)") {
    val corpus = planted(5)
    for (k <- Seq(2, 8)) {
      val got = SemDedup.pairs(corpus, k = k, iters = 1, minCosine = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == (0 until 5).map(i => (i.toLong, i + 100000L)).toSet,
        s"k=$k missed planted copies")
    }
  }

  test("decisions keep the lowest id per component and drop the copies") {
    val d = SemDedup.decisions(planted(3), k = 4, iters = 1, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(d.toSeq == (0 until 3).map(i => (i.toLong, i.toLong, true)) ++
      (0 until 3).map(i => (i + 100000L, i.toLong, false)))
  }

  test("within-cluster pairs are a subset of global brute-force pairs") {
    // SemDeDup can only MISS pairs (cluster-boundary recall loss), never
    // invent them: every emitted pair must clear the threshold globally.
    // Ground truth is an exact all-pairs computation in plain Scala —
    // NOT bruteForceTopK, whose top-k truncation would under-count dense
    // neighborhoods and flag correct pairs as "invented".
    val corpus = planted(2)
    val sem = SemDedup.pairs(corpus, k = 6, iters = 1, minCosine = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val (d, na, nb) = a.indices.foldLeft((0.0, 0.0, 0.0)) { case ((s, x, y), i) =>
        (s + a(i) * b(i), x + a(i) * a(i), y + b(i) * b(i))
      }
      d / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if BigDecimal(cos(vecs(i), vecs(j))).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.4
    } yield (i, j)).toSet
    assert(sem.subsetOf(brute), s"invented pairs: ${sem -- brute}")
    assert(sem.nonEmpty)
  }

  test("maxClusterSize drops degenerate clusters before the self-join") {
    // k=1 puts everything in one cluster; capping it below the corpus
    // size must yield zero candidates rather than a quadratic join.
    val corpus = planted(3)
    val capped = SemDedup.pairs(corpus, k = 1, iters = 0, minCosine = 0.95,
      maxClusterSize = Some(10))
    assert(capped.count() == 0L)
    intercept[IllegalArgumentException] {
      SemDedup.pairs(corpus, k = 1, maxClusterSize = Some(1))
    }
  }

  test("ε-band pruning: full recall on planted copies, subset of the exact path") {
    // Identical vectors have identical centroid cosines, so copies sort
    // adjacent (id tiebreak can interleave same-distance groups — w=8
    // absorbs that on 5 planted groups) and the band must not lose them.
    val corpus = planted(5)
    val exact = SemDedup.pairs(corpus, k = 4, iters = 1, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SemDedup.pairs(corpus, k = 4, iters = 1, minCosine = 0.95,
        bandWidth = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(exact), s"band invented pairs: ${banded -- exact}")
    val plantedPairs = (0 until 5).map(i => (i.toLong, i + 100000L)).toSet
    assert(plantedPairs.subsetOf(banded),
      s"band lost planted copies: ${plantedPairs -- banded}")
  }

  test("ε-band candidate volume is linear in the band, not quadratic in the cluster") {
    // One cluster of n members: the exact path joins n²/2 candidates;
    // a width-w band at most n·w. Count candidates via a threshold of
    // -1 (every candidate survives the cosine filter) — the pair count
    // IS the candidate count.
    val corpus = planted(2) // n = base + 2 copies, all in one cluster at k=1
    val n = corpus.count()
    val w = 3
    val bandedCount = SemDedup.pairs(corpus, k = 1, iters = 0,
      minCosine = -1.0, bandWidth = Some(w)).count()
    assert(bandedCount <= n * w,
      s"banded candidates $bandedCount exceed n·w = ${n * w}")
    val exactCount = SemDedup.pairs(corpus, k = 1, iters = 0,
      minCosine = -1.0).count()
    assert(exactCount == n * (n - 1) / 2)
    assert(bandedCount < exactCount)
  }

  test("banded decisions still drop every planted copy") {
    val d = SemDedup.decisions(planted(3), k = 4, iters = 1,
        minCosine = 0.95, bandWidth = Some(8))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    (0 until 3).foreach { i =>
      assert(d(i + 100000L) == false, s"copy of $i kept")
      assert(d(i.toLong) == true, s"original $i dropped")
    }
  }
}
