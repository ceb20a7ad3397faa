package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X43 — embedding-distribution drift between two corpus snapshots: did
  * a group's embedding mass MOVE between yesterday's corpus and
  * today's? The embedding-side counterpart of X20's value-distribution
  * PSI and X25's content diff — an upstream encoder change, a crawl
  * topic shift, or a poisoned source shows up as a centroid
  * displacement long before any scalar metric moves.
  *
  * Exactness discipline (the X2h centroid pattern): vectors quantize
  * through the SHARED int8 [[Quantize.quantize]] definition, each
  * snapshot's per-(group, dim) sums are exact integer aggregates, and
  * the comparable per-dim centroid is the TRUNCATED micro-mean
  * `(s·10⁶) div n`. Unlike the [[Chunking]] case (float `//`, which
  * DuckDB floors), integer-operand division truncates toward zero in
  * BOTH engines (measured: a floor-spelled variant diverged on every
  * negative dimension sum), so the plain `div` is the portable form
  * here. The reported
  * `drift_num = Σ_dims (mA − mB)²` is then pure integer math,
  * DECIMAL(38,0)-accumulated (|m| ≤ 127·10⁶ → ~1.6·10¹⁶ per dim — a
  * long sum would sit one burst away from wrap at high dim).
  *
  * Scale shape: quantization map-only; ONE shuffle per snapshot
  * (partial aggs combine map-side to |groups|·dim rows); the dim-sized
  * censuses join co-partitioned on (group, dim); the final rollup is a
  * |groups|-row aggregate. Groups absent from either snapshot have no
  * defined drift and drop through the inner join (surface them with
  * X25's corpus diff; documented, pinned in spec).
  */
object EmbedDrift {

  private def census(snap: DataFrame, idCol: String, vecCol: String,
                     groupCol: String, sCol: String, nCol: String) =
    Quantize.quantize(snap, idCol, vecCol, keep = Seq(groupCol))
      .select(col(groupCol), posexplode(col("qvec")).as(Seq("__pos", "__q")))
      .groupBy(col(groupCol), col("__pos"))
      .agg(sum(col("__q").cast("long")).as(sCol),
        count(lit(1)).as(nCol))

  /** Per-group drift: (groupCol, n_prev, n_cur, drift_num). */
  def centroidDrift(prev: DataFrame, cur: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    groupCol: String = "label"): DataFrame = {
    val a = census(prev, idCol, vecCol, groupCol, "__sa", "__na")
    val b = census(cur, idCol, vecCol, groupCol, "__sb", "__nb")
    a.join(b, Seq(groupCol, "__pos"))
      .withColumn("__ma", expr("(__sa * 1000000) div __na"))
      .withColumn("__mb", expr("(__sb * 1000000) div __nb"))
      .groupBy(col(groupCol))
      .agg(
        max(col("__na")).as("n_prev"),
        max(col("__nb")).as("n_cur"),
        sum(((col("__ma") - col("__mb")) * (col("__ma") - col("__mb")))
          .cast("decimal(38,0)")).as("drift_num"))
  }
}
