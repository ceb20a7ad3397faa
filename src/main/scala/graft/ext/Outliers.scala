package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X2h — embedding-space outlier detection: the documents farthest from
  * their group's centroid are the mislabeled, off-topic, or corrupted
  * ones — the embedding-side quality screen (SemDeDup finds documents
  * too CLOSE together; this finds the ones too FAR from where they
  * claim to belong).
  *
  * Exactness discipline: distances are computed over the int8-QUANTIZED
  * vectors ([[Quantize.quantize]] — one shared definition with X2d), so
  * every quantity after the (bit-reproducible, double-arithmetic)
  * quantization step is INTEGER math: the per-group centroid stays a
  * RATIONAL (per-dimension sum `s`, count `n`) and the reported score
  * is the numerator `dist_num = Σ_i (q_i·n − s_i)²` = `n²·‖q − μ‖²` —
  * rank-equivalent to the true distance within a group (n is constant
  * per group) and exactly replayable in SQL. DECIMAL(38,0) end to end:
  * at 10⁹ rows per group, `q_i·n` ≈ 10¹¹ and its square ≈ 10²² —
  * past 2⁶³, inside decimal range.
  *
  * Plan shape at 100 TB: quantization is map-only; the centroid census
  * is ONE shuffle whose partial aggregates combine map-side to
  * |groups|·dim rows; centroids broadcast back; the distance is one
  * map-only pass; the top-N cut rides [[TopK.topNPerGroup]] (the X6b
  * staged, skew-safe plan — no global window over the corpus). */
object Outliers {

  /** Top-`topN` outliers per `groupCol`, ranked by `dist_num` DESC
    * (ties to min `idCol`): `(group, vec_id, dist_num,
    * rank_in_group)`. */
  def centroidOutliers(emb: DataFrame, topN: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       groupCol: String = "label"): DataFrame = {
    val q = Quantize.quantize(emb, idCol, vecCol, keep = Seq(groupCol))
      .select(col(idCol), col(groupCol), col("qvec"))
    // Per-(group, dim) integer sums — the rational centroid. The
    // posexplode shuffles dim× the row count nominally, but partial
    // aggregation combines to |groups|·dim rows per map task before
    // any network move.
    val dims = q.select(col(groupCol),
        posexplode(col("qvec")).as(Seq("__pos", "__q")))
      .groupBy(col(groupCol), col("__pos"))
      .agg(sum(col("__q").cast("long")).as("__s"),
        count(lit(1)).as("__n"))
    // Re-pack to one row per group (position-sorted sum vector) — a
    // |groups|·dim frame collapsing to |groups| rows; broadcasts.
    val cen = dims
      .groupBy(col(groupCol).as("__cg"))
      .agg(
        transform(
          sort_array(collect_list(struct(col("__pos"), col("__s")))),
          e => e.getField("__s")).as("__cs"),
        max(col("__n")).as("__cn"))
    // ONE native primitive loop per row ([[graft.functions
    // .CentroidDistNum]] — long fast path, BigInteger only when a
    // group is large enough to overflow; the interpreted
    // aggregate(zip_with(...)) decimal fold it replaces measured
    // ~0.65 ms/row at dim 64).
    val scored = q.join(broadcast(cen), col(groupCol) === col("__cg"))
      .withColumn("dist_num",
        graft.functions.VectorFunctions.centroidDistNum(
          col("qvec"), col("__cs"), col("__cn")))
      .select(col(idCol), col(groupCol), col("dist_num"))
    TopK.topNPerGroup(scored, groupCol, "dist_num", topN, keyCol = idCol)
      .select(col(groupCol), col(idCol),
        col("dist_num"), col("rank_in_group").cast("long").as("rank_in_group"))
  }
}
