package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X1f — fuzzy-dedup RESOLUTION: candidate pairs → keep/drop decisions.
  *
  * The X1 detectors ([[Dedup.jaccardPairs]], [[Dedup.minhashPairs]],
  * [[Dedup.simhashPairs]], [[Similarity.nearDupPairs]]) emit candidate
  * PAIRS; a curation run needs per-document verdicts — near-duplicate
  * similarity is not transitive, so the standard resolution treats pairs
  * as an undirected graph, takes CONNECTED COMPONENTS as duplicate
  * clusters, and keeps one canonical document per cluster (the lowest
  * key, matching [[Dedup.exactDedup]]'s min-per-group convention).
  *
  * Scale shape: everything here runs on the PAIR graph, whose vertex set
  * is bounded by 2×|pairs| — the detectors' blocked/bucketed output, far
  * smaller than the corpus. Components come from iterative min-label
  * propagation: each round, every vertex takes the minimum label among
  * itself and its neighbors (one equi-join on `src` + one partial-agg
  * `groupBy(dst).min` — no GraphX dependency, no driver-side graph).
  * Convergence is bounded by the component DIAMETER, and near-dup
  * clusters are dense by construction (a genuine duplicate group is
  * near-clique: its members pair with most of each other), so diameters
  * are small; `maxIters` guards the adversarial chain case and the loop
  * THROWS if it runs out — an unconverged labeling would silently split
  * clusters. Each round `localCheckpoint`s the (small) label frame,
  * truncating the iterative join lineage that would otherwise grow the
  * plan exponentially.
  */
object DedupResolve {

  /** Connected components of the undirected pair graph: one row per
    * vertex, `component` = the smallest vertex id reachable from it.
    * Accepts any pair frame with `aCol`/`bCol` key columns; multi-edges
    * (the same pair found by several detectors) are deduplicated. */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_id_a",
                          bCol: String = "doc_id_b",
                          maxIters: Int = 25): DataFrame = {
    require(maxIters >= 1, s"maxIters ($maxIters) must be >= 1")
    import org.apache.spark.sql.graftbridge.CheckpointBridge.releaseLocalCheckpoint
    // Both directions once: propagation below only looks src → dst, so
    // the symmetric closure makes the graph undirected. Keys keep their
    // native type — a cast here would turn e.g. string doc ids into
    // nulls and silently collapse the graph. min() requires an ordered
    // type, which every sensible document key (numeric/string) has.
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true) // consumed once per iteration — pin it
    // `labelsCkpt` is always the checkpointed frame backing `labels` (the
    // bridge releases a bare checkpoint root, not a projection over it).
    var labelsCkpt = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var labels = labelsCkpt
    var iter = 0
    var changed = 1L
    while (changed > 0) {
      if (iter >= maxIters)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIters iterations — " +
            "the pair graph has a longer chain than expected; raise maxIters " +
            "(an unconverged labeling would silently split clusters)")
      // Min label among each vertex's neighbors, then fold into its own.
      val nbrMin = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
        .groupBy("id").agg(min("label").as("__nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("__nbr"), col("label"))).as("label"),
          (coalesce(col("__nbr"), col("label")) < col("label")).as("__ch"))
        .localCheckpoint(true)
      changed = next.filter(col("__ch")).count()
      // The superseded generation is dead the moment `next` materialized —
      // release its block-manager storage instead of letting one
      // generation per round pile up until GC (Dataset.unpersist doesn't
      // touch local-checkpoint blocks; see CheckpointBridge).
      releaseLocalCheckpoint(labelsCkpt)
      labelsCkpt = next
      labels = next.drop("__ch")
      iter += 1
    }
    releaseLocalCheckpoint(edges) // the final labels checkpoint stays live
    labels.select(col("id"), col("label").as("component"))
  }

  /** Keep/drop decision per document: `cluster_id` = the smallest doc id
    * in the document's duplicate cluster (its own id when it pairs with
    * nothing), `keep` = it IS that canonical minimum. The component join
    * touches only pair-graph vertices — a corpus-sized `docs` frame joins
    * a small verdict table (broadcast at scale). */
  def dedupGroups(docs: DataFrame, pairs: DataFrame,
                  keyCol: String = "doc_id", aCol: String = "doc_id_a",
                  bCol: String = "doc_id_b", maxIters: Int = 25): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters)
      .withColumnRenamed("id", keyCol)
    docs.select(col(keyCol))
      .join(comp, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("component"), col(keyCol)).as("cluster_id"),
        (coalesce(col("component"), col(keyCol)) === col(keyCol)).as("keep"))
  }

  /** Only the DROP side of [[dedupGroups]] — one row per document to
    * remove. This is what a curation pipeline joins against: bounded by
    * the number of detected duplicates, so it broadcasts even when the
    * corpus doesn't. */
  def dropSet(pairs: DataFrame, aCol: String = "doc_id_a",
              bCol: String = "doc_id_b", maxIters: Int = 25): DataFrame =
    connectedComponents(pairs, aCol, bCol, maxIters)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
}
