package graft

import graft.ext.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** X2 similarity search: cosine math, exact top-k (custom bounded
  * Aggregator), and ANN recall on a clustered fixture. */
class SimilaritySpec extends SparkSpec {

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private val tiny = df(Seq(
    Row(0L, vec(1, 0, 0, 0)),
    Row(1L, vec(0, 1, 0, 0)),       // orthogonal to 0
    Row(2L, vec(1, 0.01, 0, 0)),    // nearly parallel to 0
    Row(3L, vec(-1, 0, 0, 0)),      // antiparallel to 0
    Row(4L, vec(1, 1, 0, 0))),      // 45° to 0
    "vec_id BIGINT, embedding ARRAY<FLOAT>")

  test("cosine: identical → 1, orthogonal → 0, antiparallel → -1, 45° → √2/2") {
    val sims = tiny.crossJoin(tiny.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("vec_id") === 0)
      .select(col("b_id"), Similarity.cosine(col("embedding"), col("b")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sims(0L) - 1.0) < 1e-12)
    assert(math.abs(sims(1L)) < 1e-12)
    assert(math.abs(sims(3L) + 1.0) < 1e-12)
    assert(math.abs(sims(4L) - math.sqrt(2) / 2) < 1e-9)
  }

  test("bruteForceTopK ranks by similarity, excludes self, caps at k") {
    val res = Similarity.bruteForceTopK(tiny, tiny.filter("vec_id = 0"), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (rank, neighbor)
    assert(res.length == 3)
    assert(res(0) == (1L, 2L)) // rank 1: the nearly-parallel vector
    assert(res(1) == (2L, 4L)) // rank 2: 45°
    assert(res(2) == (3L, 1L)) // rank 3: orthogonal beats antiparallel
  }

  test("hardNegatives excludes planted duplicates above the band and " +
       "uninformative candidates below it; equals banded brute force") {
    // Corpus: the query's exact copy (sim 1.0 — a POSITIVE, must not
    // leak into the negative set), a hard negative at ~45°, a mild one
    // near orthogonal, and an antiparallel one below the floor.
    val corpus = df(Seq(
      Row(10L, vec(1, 0, 0, 0)),     // exact copy of the query → excluded (> 0.95)
      Row(11L, vec(1, 1, 0, 0)),     // sim ≈ 0.707 → the hardest negative
      Row(12L, vec(0.1, 1, 0, 0)),   // sim ≈ 0.0995 → mild negative
      Row(13L, vec(-1, 0, 0, 0))),   // sim -1 → below the floor, excluded
      "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val query = df(Seq(Row(0L, vec(1, 0, 0, 0))),
      "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val got = Similarity.hardNegatives(corpus, query, k = 5,
        minSim = 0.0, maxSim = 0.95)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(11L, 12L),
      "band must keep exactly the informative negatives, hardest first")
    // And the plain top-k WOULD have ranked the duplicate first — the
    // band is what keeps the positive out of the negative set.
    val plain = Similarity.bruteForceTopK(corpus, query, k = 1)
      .collect().head.getAs[Long]("neighbor_id")
    assert(plain == 10L)
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(corpus, query, 5, minSim = 0.9, maxSim = 0.1)
    }
  }

  test("mrlTopK at full dims equals brute force; truncated stage bounds candidates") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    // Truncating to the FULL dimension with candidates >= corpus is the
    // identity pipeline: stage 1 ranks on the whole vector and stage 2
    // re-ranks the same similarities — must equal bruteForceTopK row
    // for row.
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toSeq)
    val full = Similarity.mrlTopK(emb, queries, k = 5, dims = dim,
        candMult = 1000).collect().map(_.toSeq)
    assert(full.sameElements(exact))
    // Truncated retrieval: exactly k ranked rows per query, ranks
    // dense from 1, every neighbor real and non-self — and the result
    // is partitioning-invariant (both stages are deterministic).
    val a = Similarity.mrlTopK(emb, queries, k = 5, dims = 16).collect()
    assert(a.length == 5 * 5)
    a.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to 5L))
      assert(rows.forall(_.getLong(2) != q))
    }
    val b = Similarity.mrlTopK(emb.repartition(13), queries, k = 5,
      dims = 16).collect()
    assert(a.map(_.toSeq).sortBy(_.toString)
      .sameElements(b.map(_.toSeq).sortBy(_.toString)))
  }

  test("TopKAggregator is deterministic under ties (ascending id)") {
    val dupSims = df(Seq(
      Row(0L, vec(1, 0, 0, 0)),
      Row(7L, vec(0, 1, 0, 0)),
      Row(5L, vec(0, 0, 1, 0)),  // both orthogonal: sim 0 ties
      Row(9L, vec(0, 0, 0, 1))),
      "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val res = Similarity.bruteForceTopK(dupSims, dupSims.filter("vec_id = 0"), k = 3)
      .collect().map(_.getLong(2))
    assert(res.toSeq == Seq(5L, 7L, 9L)) // tie broken by id
  }

  test("TopKAggregator buffer stays bounded through compaction") {
    val agg = new Similarity.TopKAggregator(2)
    var buf = agg.zero
    (1 to 100).foreach(i => buf = agg.reduce(buf, Similarity.Neighbor(i.toLong, i / 100.0)))
    assert(buf.ids.length <= 8 && buf.sims.length == buf.ids.length) // 4k bound
    val out = agg.finish(buf)
    assert(out.map(_.id) == Seq(100L, 99L))
  }

  /** Clustered fixture: 20 well-separated unit vectors, each with a
    * planted near-duplicate; ANN must recover the planted neighbor. */
  test("annTopK finds planted nearest neighbors (recall ≥ 0.9)") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0 until 20).flatMap { c =>
      val base = unit()
      val nearDup = base.zip(unit()).map { case (b, u) => b + 0.1 * u }
      Seq(Row(c.toLong, base.map(_.toFloat).toSeq),
        Row((100 + c).toLong, nearDup.map(_.toFloat).toSeq))
    }
    val data = df(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val queries = data.filter("vec_id < 100")
    val ann = Similarity.annTopK(data, queries, k = 1, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = (0 until 20).count(c => ann.get(c.toLong).contains(100L + c))
    assert(hits >= 18, s"ANN recalled only $hits/20 planted neighbors")
  }

  test("ann results are a subset-consistent approximation of brute force on testdata") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter("vec_id < 5")
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
    val ann = Similarity.annTopK(emb, queries, k = 5)
    // ANN similarity scores can never exceed the brute-force rank-1 score.
    val bruteBest = brute.filter("rank = 1")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ann.filter("rank = 1").collect().foreach { r =>
      assert(r.getDouble(3) <= bruteBest(r.getLong(0)) + 1e-9)
    }
  }

  test("saved band index probes identically to fresh annTopK (saveBands → annTopKAgainst)") {
    // The persisted-ANN nightly shape: bands + hyperplane params saved
    // once, later shards probe the stored signatures. Exact equality
    // with the in-memory path pins the parquet round trip AND that the
    // probe side re-derives its bands from the SAVED params.
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter("vec_id < 5")
    val fresh = Similarity.annTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dir = java.nio.file.Files.createTempDirectory("lsh_save").toString
    Similarity.saveBands(emb, dir)
    val against = Similarity.annTopKAgainst(spark, dir, emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fresh.nonEmpty && against.toSeq == fresh.toSeq)
  }

  test("nearDupPairs surfaces planted high-cosine pairs only") {
    val r1 = new scala.util.Random(11)
    val r3 = new scala.util.Random(99)
    val base = Array.fill(64)(r1.nextGaussian())
    val rows = Seq(
      Row(1L, base.map(_.toFloat).toSeq),
      Row(2L, base.map(x => (x * 1.001).toFloat).toSeq), // same direction
      Row(3L, Array.fill(64)(r3.nextGaussian().toFloat).toSeq))
    val data = df(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val pairs = Similarity.nearDupPairs(data, minSim = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("nearDupPairs under a bucket cap still finds every planted copy") {
    // Same planted-copy construction as the x1_embed_neardup query: five
    // exact copies over a corpus with no natural pairs above 0.52. The
    // testdata's hottest LSH bucket holds 14 members, so cap=8 genuinely
    // drops buckets — but identical vectors collide in ALL 8 bands, and
    // at least one of those buckets is small enough to survive.
    val emb = Tables.embeddings(spark, sfDir)
    val offset = 100000L
    val planted = emb.filter("vec_id < 5")
      .selectExpr(s"vec_id + $offset AS vec_id", "embedding", "label")
    val corpus = emb.unionByName(planted)
    val capped = Similarity.nearDupPairs(corpus, minSim = 0.95,
        maxBucketSize = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 5L).map(i => (i, i + offset)).toSet
    assert(capped == expected,
      s"cap lost ${(expected -- capped).size} of 5 planted pairs")
  }
}
