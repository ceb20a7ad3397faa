package graft

import graft.ext.{IvfIndex, Similarity, Skew}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Skew utilities and the IVF ANN index. */
class SkewIvfSpec extends SparkSpec {

  test("saltedJoin equals the plain join on a skewed key") {
    // 90% of the big side is one hot key.
    val big = df((1 to 200).map(i =>
      Row(i.toLong, if (i <= 180) "HOT" else s"k${i % 7}")), "id BIGINT, k STRING")
    val small = df(Seq(Row("HOT", 1.0), Row("k1", 2.0), Row("k3", 3.0)),
      "k STRING, w DOUBLE")
    val plain = big.join(small, "k").select("id", "w")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).select("id", "w")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("autoSaltedJoin picks broadcast/salted/plain from the profile, result-identical") {
    val big = df((1 to 200).map(i =>
      Row(i.toLong, if (i <= 160) "HOT" else s"k${i % 5}")), "id BIGINT, k STRING")
    val small = df(Seq(Row("HOT", 1.0), Row("k1", 2.0), Row("k3", 3.0)),
      "k STRING, w DOUBLE")
    val expected = big.join(small, "k").select("id", "w")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq

    // Small side fits → broadcast, regardless of skew.
    assert(Skew.chooseStrategy(big, small, "k") == Skew.BroadcastJoin)
    // Broadcast forbidden + 80% hot key → salted spray.
    assert(Skew.chooseStrategy(big, small, "k", broadcastRowLimit = 0) ==
      Skew.SprayJoin(16))
    // Broadcast forbidden + no dominant key → plain shuffle join.
    val uniform = df((1 to 200).map(i => Row(i.toLong, s"k${i % 20}")),
      "id BIGINT, k STRING")
    assert(Skew.chooseStrategy(uniform, small, "k", broadcastRowLimit = 0) ==
      Skew.PlainJoin)

    // Result identity under every forced strategy.
    for (limit <- Seq(0L, 1000000L)) {
      val got = Skew.autoSaltedJoin(big, small, "k", broadcastRowLimit = limit)
        .select("id", "w")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(got == expected, s"strategy at broadcastRowLimit=$limit diverged")
    }
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val big = df((1 to 100).map(i =>
      Row(i.toLong, if (i <= 80) "HOT" else "COLD")), "id BIGINT, k STRING")
    val top = Skew.keySkewProfile(big, "k", 1).head()
    assert(top.getString(0) == "HOT")
    assert(top.getAs[Double]("share") == 80.0)
  }

  /** 10 well-separated clusters of 8 vectors each: IVF with nProbe=2 must
    * recover each query's own-cluster nearest neighbor. */
  test("IVF index recalls in-cluster nearest neighbors") {
    val rnd = new scala.util.Random(13)
    val dim = 32
    val centers = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian() * 5))
    val rows = for (c <- 0 until 10; j <- 0 until 8) yield {
      val v = centers(c).map(_ + rnd.nextGaussian() * 0.1)
      Row((c * 8 + j).toLong, v.map(_.toFloat).toSeq)
    }
    val data = df(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    val model = IvfIndex.build(data, k = 10, iters = 3)

    val queries = data.filter("vec_id % 8 = 0") // one per cluster
    val ivf = IvfIndex.topK(model, data, queries, k = 1, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val brute = Similarity.bruteForceTopK(data, queries, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = brute.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits >= 9, s"IVF matched brute force on only $hits/10 queries")
  }

  test("IVF probe join broadcasts the probes side (never shuffles assignments)") {
    // The assignments side is keyed on `cluster`, which has only k
    // distinct values — a shuffle on it is catastrophic skew at corpus
    // scale. The broadcast(probes) pin must survive to the physical plan.
    val emb = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.build(emb, k = 4, iters = 1)
    val plan = IvfIndex.topK(model, emb, emb.filter("vec_id < 3"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [cluster"),
      s"probe join is not a broadcast join on cluster:\n$plan")
  }

  test("IVF with nProbe = k degenerates to exact brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.build(emb, k = 4, iters = 2)
    val queries = emb.filter("vec_id < 3")
    val ivf = IvfIndex.topK(model, emb, queries, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ivf.toSeq == brute.toSeq)
    // The corpus-vs-corpus escape hatch (no broadcast pin) must produce
    // the identical result through the optimizer-chosen join.
    val unpinned = IvfIndex.topK(model, emb, queries, k = 3, nProbe = 4,
        broadcastProbes = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(unpinned.toSeq == brute.toSeq)
  }

  test("saved index probes identically to the fresh build (save → load → topKAgainst)") {
    // The production ANN shape: the index is built once and persisted;
    // later shards probe the LOADED index. Exact result equality with
    // the in-memory model pins both the parquet round trip (centroid
    // matrix bit-for-bit, inverted lists row-for-row) and the probe
    // path's independence from how the model frame was produced.
    val emb = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.build(emb, k = 4, iters = 2)
    val queries = emb.filter("vec_id < 5")
    val fresh = IvfIndex.topK(model, emb, queries, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dir = java.nio.file.Files.createTempDirectory("ivf_save").toString
    IvfIndex.save(model, dir)
    model.release()
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.length == 4 &&
      loaded.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq,
      "centroid matrix did not survive the parquet round trip")
    val against = IvfIndex.topKAgainst(spark, dir, emb, queries, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(against.toSeq == fresh.toSeq)
  }
}
