package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DedupResolve}

/** X1f fuzzy-dedup resolution: connected components over candidate pairs,
  * keep-canonical-per-cluster, and the closure/convergence properties the
  * oracle's recursive CTE assumes. */
class DedupResolveSpec extends SparkSpec {

  private def pairsDF(ps: (Long, Long)*) =
    df(ps.map(p => Row(p._1, p._2)), "doc_id_a BIGINT, doc_id_b BIGINT")

  test("components: chain, triangle, and isolated pair resolve to min labels") {
    // Chain 1-2-3-4 (diameter 3, forces real propagation), triangle
    // 10-11-12 plus the closing edge, isolated pair 20-21.
    val pairs = pairsDF((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    val comp = DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components are closed under the input pairs (property, real fixtures)") {
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, sfDir),
      n = 4, minSim = 0.8)
    assert(pairs.count() > 0, "planted near-dup fixtures expected")
    val comp = DedupResolve.connectedComponents(pairs)
    // Every pair's endpoints share a component…
    val broken = pairs
      .join(comp.select(col("id").as("doc_id_a"), col("component").as("ca")), "doc_id_a")
      .join(comp.select(col("id").as("doc_id_b"), col("component").as("cb")), "doc_id_b")
      .filter(col("ca") =!= col("cb"))
    assert(broken.count() == 0)
    // …every component's label is a member of the component…
    assert(comp.filter(col("id") === col("component")).count() ==
      comp.select("component").distinct().count())
    // …and the label is the MINIMUM member.
    assert(comp.groupBy("component").agg(min("id").as("m"))
      .filter(col("m") =!= col("component")).count() == 0)
  }

  test("dedupGroups keeps exactly one canonical doc per cluster") {
    val docs = df((1L to 30L).map(Row(_)), "doc_id BIGINT")
    val pairs = pairsDF((1L, 2L), (2L, 3L), (10L, 11L))
    val groups = DedupResolve.dedupGroups(docs, pairs)
    assert(groups.count() == 30)
    // One keeper per cluster, and it is the min.
    assert(groups.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("keepers"),
        min("doc_id").as("m"), first("cluster_id").as("c"))
      .filter(col("keepers") =!= 1L || col("m") =!= col("c")).count() == 0)
    // Docs in no pair are their own singleton cluster, kept.
    assert(groups.filter(col("doc_id") === 20L)
      .select("cluster_id", "keep").head() == Row(20L, true))
    // dropSet is exactly the non-canonical members.
    val drops = DedupResolve.dropSet(pairs).collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L, 3L, 11L))
  }

  test("random graphs agree with a driver-side union-find oracle") {
    // Deterministic pseudo-random edge sets (no RNG API — the multiplier
    // walk is fixed): dense-ish and sparse regimes, compared against a
    // classic union-find computed on the driver.
    for ((nVertices, nEdges, salt) <- Seq((40L, 50, 1L), (60L, 30, 2L), (25L, 80, 3L))) {
      val edges = (0 until nEdges).map { i =>
        val a = math.abs((i * 2654435761L + salt) % nVertices)
        val b = math.abs((i * 40503L + salt * 7L + 13L) % nVertices)
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val parent = scala.collection.mutable.Map((0L until nVertices).map(v => v -> v): _*)
      def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = vertices.map { v =>
        // Component label = min vertex sharing v's union-find root.
        val r = find(v)
        v -> vertices.filter(find(_) == r).min
      }.toMap
      val got = DedupResolve.connectedComponents(pairsDF(edges: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"mismatch for salt=$salt")
    }
  }

  test("non-convergence throws instead of silently splitting clusters") {
    // Chain of diameter 3 cannot settle in 1 iteration. maxDriverPairs=0
    // forces the distributed path — the driver union-find would resolve
    // any chain without iterating.
    val pairs = pairsDF((1L, 2L), (2L, 3L), (3L, 4L))
    val e = intercept[IllegalStateException](
      DedupResolve.connectedComponents(pairs, maxIters = 1, maxDriverPairs = 0)
        .collect())
    assert(e.getMessage.contains("converge"))
  }

  test("driver and distributed paths produce identical labelings") {
    // The driver fast path must be observationally equivalent to the
    // iterative propagation — same graphs through both, compared exactly.
    for ((nVertices, nEdges, salt) <- Seq((40L, 50, 4L), (30L, 12, 5L))) {
      val edges = (0 until nEdges).map { i =>
        val a = math.abs((i * 2654435761L + salt) % nVertices)
        val b = math.abs((i * 40503L + salt * 7L + 13L) % nVertices)
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val driver = DedupResolve.connectedComponents(pairsDF(edges: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = DedupResolve.connectedComponents(pairsDF(edges: _*),
          maxDriverPairs = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(driver == dist, s"paths diverge for salt=$salt")
    }
  }

  test("an oversized pair set falls through to the distributed path") {
    val pairs = pairsDF((1L, 2L), (2L, 3L), (4L, 5L))
    val comp = DedupResolve.connectedComponents(pairs, maxDriverPairs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("multi-detector unions with duplicate and reversed pairs resolve once") {
    val pairs = pairsDF((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    val comp = DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("minhash-derived pairs resolve to the same drop set as exact jaccard") {
    // On the planted fixtures the LSH detector finds the same pair set as
    // the exact detector (docstring of Queries.x1MinhashPairs), so the
    // RESOLUTION must agree too — the property that lets a user swap the
    // cheap detector into the funnel without changing curation results.
    val docs = Tables.documents(spark, sfDir)
    val exact = DedupResolve.dropSet(
      Dedup.jaccardPairs(docs, n = 4, minSim = 0.8))
      .collect().map(_.getLong(0)).toSet
    val lsh = DedupResolve.dropSet(
      Dedup.minhashPairs(docs, n = 4, bands = 8, minSim = 0.7))
      .collect().map(_.getLong(0)).toSet
    assert(exact == lsh)
    assert(exact.nonEmpty)
  }
}
