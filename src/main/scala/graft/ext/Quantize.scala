package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X2d — scalar int8 embedding quantization, the memory lever for
  * similarity search at corpus scale: a 4096-dim float32 embedding is
  * 16 KB; its int8 form plus one float scale is ~4 KB. At 100 TB of
  * embeddings that factor-4 is the difference between an index that fits
  * executor memory and one that doesn't. (Classic scalar-quantization
  * ANN design — see the IVF/PQ literature in /root/repo/PAPERS.md.)
  *
  * Scheme: per-vector symmetric scaling — `scale = max|x| / 127`,
  * `q_i = round(x_i / scale)` ∈ [-127, 127], stored as `array<tinyint>`
  * plus the float scale. Cosine over quantized vectors needs NO
  * dequantization: the per-vector scales cancel, so
  * `cos(qa, qb) ≈ cos(a, b)` directly on the int arrays — one fused
  * [[graft.functions.CosineSimilarity]] pass over tinyint-as-float.
  *
  * All arithmetic (max|x|, the division, `round`) happens in double on
  * both the Spark side and the DuckDB oracle, so the quantized vectors —
  * and therefore the ranking — are bit-for-bit reproducible.
  */
object Quantize {

  /** Quantize `vecCol` to (qvec array<tinyint>, scale float). The
    * zero-vector guard keeps ANSI mode from overflowing on round(±Inf);
    * a zero vector quantizes to zeros with scale 0. `keep` columns ride
    * along unchanged (e.g. a group label for [[Outliers]]). */
  def quantize(df: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding",
               keep: Seq[String] = Nil): DataFrame = {
    // max|x| materialized through its own projection: HOF lambdas are
    // interpreted, and the transform below references it per element.
    val maxabs = col("__maxabs")
    df.select(col(idCol) +: keep.map(col) :+
        col(vecCol).cast("array<double>").as("__v"): _*)
      .withColumn("__maxabs", array_max(transform(col("__v"), x => abs(x))))
      .select(col(idCol) +: keep.map(col) :+
        when(maxabs === 0d,
            transform(col("__v"), _ => lit(0d)))
          .otherwise(transform(col("__v"), x => round(x / (maxabs / 127d))))
          .cast("array<tinyint>").as("qvec") :+
        (maxabs / 127d).cast("float").as("scale"): _*)
  }

  /** Exact top-k cosine over the QUANTIZED corpus: same broadcast-queries
    * × one-scan shape as [[Similarity.bruteForceTopK]], but each
    * candidate row carries 1/4 the bytes. Scales cancel in cosine, so no
    * dequantization multiply on the hot path. */
  def quantTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    def asFloat(c: Column): Column = c.cast("array<float>")
    val q = quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("qq"))
    val c = quantize(corpus, idCol, vecCol)
      .select(col(idCol).as("cand_id"), col("qvec").as("qc"))
    val topk = udaf(new Similarity.TopKAggregator(k))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(Similarity.cosine(asFloat(col("qq")), asFloat(col("qc"))), 6).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("cand_id"), col("sim")).as("topk"))
      .transform(Similarity.ranked)
  }
}
