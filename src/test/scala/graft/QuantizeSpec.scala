package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Quantize, Similarity}

/** X2d int8 scalar quantization: value range, reconstruction bound,
  * zero-vector guard, and quantized-vs-exact search agreement. */
class QuantizeSpec extends SparkSpec {

  test("quantized values stay in [-127, 127] and hit ±127 at the extremes") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Quantize.quantize(emb)
    val stats = q.select(
      min(array_min(col("qvec").cast("array<int>"))).as("lo"),
      max(array_max(col("qvec").cast("array<int>"))).as("hi")).head()
    assert(stats.getAs[Int]("lo") >= -127 && stats.getAs[Int]("hi") <= 127)
    // Every vector's max-magnitude element quantizes to exactly ±127.
    val maxPerVec = q.select(array_max(transform(
      col("qvec").cast("array<int>"), x => abs(x))).as("m"))
    assert(maxPerVec.filter(col("m") =!= 127).count() == 0)
  }

  test("dequantization reconstructs within scale/2 per element") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val q = Quantize.quantize(emb)
    val joined = emb.join(q, "vec_id")
      .select(zip_with(col("embedding").cast("array<double>"),
          col("qvec").cast("array<double>"),
          (x, qv) => abs(x - qv * col("scale"))).as("err"), col("scale"))
      .select(array_max(col("err")).as("maxerr"), col("scale"))
    // round() error ≤ 0.5 quantization steps (+ float scale storage slack).
    assert(joined.filter(col("maxerr") > col("scale") * 0.51).count() == 0)
  }

  test("a zero vector quantizes to zeros with scale 0 (no ANSI overflow)") {
    val data = df(Seq(
      Row(1L, Seq(0.0f, 0.0f, 0.0f)),
      Row(2L, Seq(1.0f, -2.0f, 0.5f))),
      "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val q = Quantize.quantize(data).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Byte](1), r.getFloat(2))).toMap
    assert(q(1L)._1 == Seq[Byte](0, 0, 0) && q(1L)._2 == 0.0f)
    assert(q(2L)._1 == Seq[Byte](64, -127, 32)) // scale = 2/127
  }

  test("quantized top-k agrees with exact top-k on rank-1 neighbors (testdata)") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter("vec_id < 10")
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .filter("rank = 1").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val quant = graft.ext.Quantize.quantTopK(emb, queries, k = 5)
      .filter("rank = 1").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // int8 error (~1e-2 in cosine) can swap near-ties deep in the list,
    // but the nearest neighbor should survive for nearly every query.
    val hits = exact.count { case (qid, nb) => quant.get(qid).contains(nb) }
    assert(hits >= 8, s"quantized search agreed on only $hits/10 rank-1 neighbors")
  }

  test("quantized cosine tracks exact cosine closely (mean |Δ| < 0.02)") {
    val emb = Tables.embeddings(spark, sfDir).limit(40)
    val q = Quantize.quantize(emb)
    val exact = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    val quant = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Similarity.cosine(col("a.qvec").cast("array<float>"),
          col("b.qvec").cast("array<float>")).as("cq"))
    val meanErr = exact.join(quant, Seq("ia", "ib"))
      .agg(avg(abs(col("c") - col("cq")))).head().getDouble(0)
    assert(meanErr < 0.02, s"mean quantization error $meanErr")
  }
}
