package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** X2e — SemDeDup: semantic deduplication by cluster-then-prune. Where
  * X1e ([[Similarity.nearDupPairs]]) buckets by random hyperplanes,
  * SemDeDup partitions the embedding space with the SAME k-means coarse
  * quantizer the IVF index uses ([[IvfIndex.build]]), generates
  * candidate pairs only WITHIN a cluster, keeps pairs above the cosine
  * threshold, and resolves them to keep/drop decisions through the
  * detector-agnostic component resolver ([[DedupResolve]]).
  *
  * Scale shape (100 TB): candidate volume is Σ|cluster|²/2, bounded by
  * choosing k proportional to corpus size (constant expected cluster
  * size) and, defensively, by `maxClusterSize` (the [[Dedup.dropHotKeys]]
  * aggregate-then-anti-join — a degenerate cluster around a dense mode
  * is precisely where the quadratic blows up). The cluster self-join is
  * an equality join on the cluster id — never all-pairs — and exact
  * cosine runs only on candidates, via the codegen'd
  * [[graft.functions.CosineSimilarity]].
  *
  * Determinism: identical vectors always share a cluster (the quantizer
  * is a pure function of the vector), so exact duplicates are found with
  * probability 1 at ANY k — which is what makes the planted-copy query
  * oracle-checkable even though the clustering itself is not
  * SQL-replayable. Near-duplicates may straddle a cluster boundary; that
  * recall/cost trade IS SemDeDup (raise k → cheaper and blinder).
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs: (id_a, id_b, cosine_sim) with
    * a < b, cosine rounded to 4 dp, ordered. `k`/`iters` parameterize
    * the quantizer; `maxClusterSize` (off by default) drops degenerate
    * clusters before the self-join. */
  def pairs(emb: DataFrame, k: Int, iters: Int = 2, minCosine: Double = 0.95,
            idCol: String = "vec_id", vecCol: String = "embedding",
            maxClusterSize: Option[Int] = None,
            materialize: Boolean = true): DataFrame = {
    // Ordering is a presentation contract of THIS surface only — the
    // decisions path consumes the unsorted set (the component resolver
    // re-shuffles by vertex anyway, so a pre-sort is pure waste there).
    // With materialize, the sort reads the already-pinned pair set.
    rawPairs(emb, k, iters, minCosine, idCol, vecCol,
      maxClusterSize, materialize).orderBy("id_a", "id_b")
  }

  private def rawPairs(emb: DataFrame, k: Int, iters: Int, minCosine: Double,
                       idCol: String, vecCol: String,
                       maxClusterSize: Option[Int],
                       materialize: Boolean): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val model = IvfIndex.build(emb, k, iters, idCol, vecCol)
    val asg0 = model.assignments // (idCol, cluster), cached by build
    val asg = maxClusterSize match {
      case Some(cap) =>
        require(cap >= 2, s"maxClusterSize ($cap) must be >= 2")
        Dedup.dropHotKeys(asg0, Seq("cluster"), cap)
      case None => asg0
    }
    val withVec = asg.join(emb.select(col(idCol), col(vecCol)), idCol)
    val a = withVec.select(col("cluster"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = withVec.select(col("cluster"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val out = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("__va"), col("__vb")), 4).as("cosine_sim"))
      .filter(col("cosine_sim") >= minCosine)
      // A pair straddling zero clusters can't appear; one sharing BOTH of
      // two probe-able clusters can't either (assignment is single-best),
      // so no distinct() is needed — each pair meets at most once.
    if (!materialize) out
    else {
      // Pin the (small) pair set, then drop the cached inverted lists —
      // same lifecycle as the banded dedup operators (Dedup.jaccardPairs).
      val pinned = out.localCheckpoint(true)
      model.release()
      pinned
    }
  }

  /** Full SemDeDup: pairs resolved to per-document decisions — one row
    * per id in any pair: (id, cluster_id = component minimum, keep). */
  def decisions(emb: DataFrame, k: Int, iters: Int = 2,
                minCosine: Double = 0.95, idCol: String = "vec_id",
                vecCol: String = "embedding",
                maxClusterSize: Option[Int] = None): DataFrame =
    DedupResolve.connectedComponents(
        rawPairs(emb, k, iters, minCosine, idCol, vecCol, maxClusterSize,
          materialize = true),
        aCol = "id_a", bCol = "id_b")
      .select(col("id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("keep"))
      .orderBy("id")
}
