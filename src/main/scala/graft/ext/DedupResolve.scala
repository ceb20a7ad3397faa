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
    * (the same pair found by several detectors) are deduplicated.
    *
    * Two execution paths behind one contract:
    *  - pair sets at or below `maxDriverPairs` (and with integral keys)
    *    resolve on the DRIVER by union-find — a thresholded near-dup
    *    pair set is usually minuscule next to its corpus, and the
    *    iterative path pays multiple join+checkpoint rounds of fixed
    *    overhead that dwarf the actual work at that size. The fetch is
    *    the D5 guard shape ([[graft.Client]]): limit(max+1), so driver
    *    memory is bounded by construction and an oversized set falls
    *    through rather than OOMs;
    *  - everything else (big pair sets, non-integral keys whose driver
    *    ordering could diverge from Spark's — e.g. UTF8String binary vs
    *    java.lang.String UTF-16 order) takes the distributed min-label
    *    propagation. `maxDriverPairs = 0` forces it.
    * Both paths produce identical labelings (min member per component;
    * pinned against each other in DedupResolveSpec). */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_id_a",
                          bCol: String = "doc_id_b",
                          maxIters: Int = 25,
                          maxDriverPairs: Int = 500000): DataFrame = {
    require(maxIters >= 1, s"maxIters ($maxIters) must be >= 1")
    require(maxDriverPairs >= 0, s"maxDriverPairs ($maxDriverPairs) must be >= 0")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val keyType = pairs.schema(pairs.schema.fieldIndex(aCol)).dataType
    val integral = keyType == LongType || keyType == IntegerType ||
      keyType == ShortType || keyType == ByteType
    if (integral && maxDriverPairs > 0) {
      // Null-keyed rows are dropped: a null vertex can't equi-join in the
      // distributed path either (and getLong would silently read 0).
      val fetched = pairs
        .filter(col(aCol).isNotNull && col(bCol).isNotNull)
        .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
        .distinct().limit(maxDriverPairs + 1).collect()
      if (fetched.length <= maxDriverPairs)
        return driverComponents(pairs, keyType,
          fetched.map(r => (r.getLong(0), r.getLong(1))))
      // Oversized: fall through. The pair derivation recomputes once —
      // callers that KNOW they are at that scale pass maxDriverPairs = 0
      // (and the registered operators hand over localCheckpoint-pinned
      // pair sets, where the extra scan is a cache read).
    }
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

  /** Union-find with path compression over a driver-resident edge list,
    * then min-member labeling per root — the same (vertex, min reachable
    * id) contract as the distributed path. Output schema preserves the
    * original integral key type. */
  private def driverComponents(pairs: DataFrame,
                               keyType: org.apache.spark.sql.types.DataType,
                               edges: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val vertices = parent.keys.toArray
    val minOfRoot = scala.collection.mutable.Map.empty[Long, Long]
    vertices.foreach { v =>
      val r = find(v)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, v), v)
    }
    import org.apache.spark.sql.types.{StructField, StructType}
    val spark = pairs.sparkSession
    def back(v: Long): Any = keyType match {
      case org.apache.spark.sql.types.LongType    => v
      case org.apache.spark.sql.types.IntegerType => v.toInt
      case org.apache.spark.sql.types.ShortType   => v.toShort
      case _                                      => v.toByte
    }
    val rows = vertices.toIndexedSeq.map(v =>
      org.apache.spark.sql.Row(back(v), back(minOfRoot(find(v)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", keyType, nullable = false),
        StructField("component", keyType, nullable = false))))
  }

  /** Keep/drop decision per document: `cluster_id` = the smallest doc id
    * in the document's duplicate cluster (its own id when it pairs with
    * nothing), `keep` = it IS that canonical minimum. The component join
    * touches only pair-graph vertices — a corpus-sized `docs` frame joins
    * a small verdict table (broadcast at scale). */
  def dedupGroups(docs: DataFrame, pairs: DataFrame,
                  keyCol: String = "doc_id", aCol: String = "doc_id_a",
                  bCol: String = "doc_id_b", maxIters: Int = 25,
                  maxDriverPairs: Int = 500000): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIters, maxDriverPairs)
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
              bCol: String = "doc_id_b", maxIters: Int = 25,
              maxDriverPairs: Int = 500000): DataFrame =
    connectedComponents(pairs, aCol, bCol, maxIters, maxDriverPairs)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
}
