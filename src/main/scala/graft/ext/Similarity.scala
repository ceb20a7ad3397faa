package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** X2 — similarity search over an embedding column (`array<float>`),
  * north-star extension for LLM-training-data pipelines.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k for a bounded query set —
  *    broadcast the queries, ONE scan of the corpus, per-query top-k via a
  *    partial-aggregable typed [[TopKAggregator]] (map-side combine keeps
  *    at most k rows per query per partition in flight — no shuffle of the
  *    full similarity matrix). The 100 TB baseline.
  *  - [[annTopK]]: LSH (random-hyperplane signature, banded) candidate
  *    generation → exact cosine re-rank of candidates only. The scale path
  *    when the query set itself is large: both sides bucket by band
  *    signature, the join touches colliding buckets only.
  *
  * All math in double precision over the float inputs (deterministic,
  * sequential fold — reproducible across engines for the DuckDB oracle).
  */
object Similarity {

  /** Cosine similarity of two `array` columns — the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression: one traversal, no
    * per-row allocation, double accumulation in element order (bit-for-bit
    * the dot/√(Σa²·Σb²) the DuckDB oracle computes). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine(a, b)

  /** One scored neighbor candidate flowing into the top-k aggregate. */
  final case class Neighbor(id: Long, sim: Double)

  /** Bounded per-group top-k as a typed Aggregator: the buffer never holds
    * more than 4k candidates (compacted on overflow), merges are bounded,
    * and the partial aggregate runs map-side — the scale-correct
    * alternative to `Window.partitionBy(query).orderBy(sim)` ranking,
    * which shuffles every (query, candidate) row to one partition.
    * Deterministic: ties broken by ascending id. */
  final class TopKAggregator(k: Int)
    extends Aggregator[Neighbor, ArrayBuffer[Neighbor], Seq[Neighbor]] {

    private def compact(b: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
      if (b.length <= 4 * k) b
      else { val t = b.sortBy(n => (-n.sim, n.id)).take(k); t.to(ArrayBuffer) }

    def zero: ArrayBuffer[Neighbor] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Neighbor], n: Neighbor): ArrayBuffer[Neighbor] =
      compact(b += n)
    def merge(x: ArrayBuffer[Neighbor], y: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
      compact(x ++= y)
    def finish(b: ArrayBuffer[Neighbor]): Seq[Neighbor] =
      b.sortBy(n => (-n.sim, n.id)).take(k).toSeq
    def bufferEncoder: Encoder[ArrayBuffer[Neighbor]] =
      Encoders.kryo[ArrayBuffer[Neighbor]]
    def outputEncoder: Encoder[Seq[Neighbor]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Explode a top-k array column into ranked rows
    * (query_id, rank, neighbor_id, cosine_sim) — the shared output
    * contract of every X2 operator (brute force, LSH, IVF). */
  private[ext] def ranked(grouped: DataFrame): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("nb.id").as("neighbor_id"), round(col("nb.sim"), 4).as("cosine_sim"))
      .orderBy("query_id", "rank")

  /** Exact top-k neighbors for each query vector: broadcast queries ×
    * one corpus scan, per-query top-k via [[TopKAggregator]].
    * `sim` is ranked at 6-dp rounding (then id) so the ordering is stable
    * across engines computing the same double math. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
    val topk = udaf(new TopKAggregator(k))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qvec"), col("cvec")), 6).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("cand_id"), col("sim")).as("topk"))
      .transform(ranked)
  }

  // ----------------------------------------------------------------- LSH ANN

  /** Deterministic random hyperplanes: `numBits` planes × `dim` components,
    * seeded Gaussian. */
  private[ext] def hyperplanes(dim: Int, numBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Per-band signature buckets for every vector: sign-bit signature under
    * the hyperplane family, split into `bands` sub-signatures. Output:
    * (id, band, bucket). Vectors close in cosine agree on most sign bits,
    * so they collide in at least one band with high probability. */
  def lshBands(df: DataFrame, idCol: String, vecCol: String,
               dim: Int, numBits: Int, bands: Int, seed: Long): DataFrame = {
    val planes = hyperplanes(dim, numBits, seed)
    val v = col(vecCol)
    val bits: Seq[Column] = planes.toSeq.map { p =>
      val planeArr = array(p.toSeq.map(lit): _*)
      when(graft.functions.VectorFunctions.dot(v, planeArr) >= 0, 1L).otherwise(0L)
    }
    val bitsPerBand = numBits / bands
    val bandCols = (0 until bands).map { b =>
      val sig = bits.slice(b * bitsPerBand, (b + 1) * bitsPerBand)
        .zipWithIndex.map { case (bit, i) => shiftleft(bit, i) }
        .reduce((x, y) => x.bitwiseOR(y))
      struct(lit(b).as("band"), sig.as("bucket"))
    }
    df.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
  }

  /** Approximate top-k: LSH-banded candidate generation (equality join on
    * (band, bucket) — colliding buckets only, never all-pairs) → exact
    * cosine re-rank of the candidate set → per-query top-k. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              dim: Int = 64, numBits: Int = 64, bands: Int = 8,
              seed: Long = 42L): DataFrame = {
    val cB = lshBands(corpus, idCol, vecCol, dim, numBits, bands, seed)
    val qB = lshBands(queries, idCol, vecCol, dim, numBits, bands, seed)
    val cands = cB.as("c").join(qB.as("q"),
        col("c.band") === col("q.band") && col("c.bucket") === col("q.bucket") &&
          col("c.id") =!= col("q.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("cand_id"))
      .distinct()
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
    val topk = udaf(new TopKAggregator(k))
    cands.join(broadcast(q), "query_id").join(c, "cand_id")
      .select(col("query_id"), col("cand_id"),
        round(cosine(col("qvec"), col("cvec")), 6).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("cand_id"), col("sim")).as("topk"))
      .transform(ranked)
  }

  /** X1e — embedding-cosine near-duplicate pairs: same LSH banding on one
    * corpus, self-join within buckets, exact-cosine verify, `minSim` gate.
    * Output: (vec_id_a, vec_id_b, cosine_sim), a < b. */
  def nearDupPairs(corpus: DataFrame, minSim: Double = 0.95,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   dim: Int = 64, numBits: Int = 64, bands: Int = 8,
                   seed: Long = 42L): DataFrame = {
    val b = lshBands(corpus, idCol, vecCol, dim, numBits, bands, seed)
    val cands = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("vec_id_a"), col("y.id").as("vec_id_b"))
      .distinct()
    val v = corpus.select(col(idCol), col(vecCol))
    cands
      .join(v.select(col(idCol).as("vec_id_a"), col(vecCol).as("va")), "vec_id_a")
      .join(v.select(col(idCol).as("vec_id_b"), col(vecCol).as("vb")), "vec_id_b")
      .withColumn("cosine_sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("cosine_sim") >= minSim)
      .select("vec_id_a", "vec_id_b", "cosine_sim")
      .orderBy("vec_id_a", "vec_id_b")
  }
}
