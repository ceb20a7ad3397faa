package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Dsir, Sampling}

/** X16 — DSIR importance resampling. The weight pipeline is pinned by
  * an INDEPENDENT plain-JVM restatement (java MessageDigest md5 →
  * bucket, Math.log with the documented division association), the
  * resample by the [[RefHash]] Gumbel key — so engine replay is
  * verified without Spark on the reference side, the SamplingSpec
  * discipline. */
class DsirSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) =
    df(rows.map { case (id, t) => Row(id, t) },
      "doc_id BIGINT, text STRING")

  // --- the independent reference implementation ---

  private def refNorm(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  private def refGrams(t: String): Seq[String] = {
    val n = refNorm(if (t == null) "" else t)
    if (n.isEmpty) Seq.empty
    else {
      val toks = n.split("\\s+").toSeq
      toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    }
  }

  private def refBucket(g: String, buckets: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % buckets
  }

  private def refLogw(text: String, ct: Map[Long, Long], cr: Map[Long, Long],
                      nt: Long, nr: Long, b: Int,
                      lambda: Double = Dsir.DefaultLambda): Long = {
    val unif = (1.0 - lambda) / b
    def p(c: Long, n: Long) = lambda * (c.toDouble / Math.max(n, 1L)) + unif
    refGrams(text).map { g =>
      val bk = refBucket(g, b)
      Math.round(1e6 * Math.log(
        p(ct.getOrElse(bk, 0L), nt) / p(cr.getOrElse(bk, 0L), nr)))
    }.sum
  }

  private def refCensus(docs: Seq[String], b: Int): Map[Long, Long] =
    docs.flatMap(refGrams).groupBy(refBucket(_, b))
      .map { case (k, v) => k -> v.size.toLong }

  test("bucket census and totals match the plain-JVM reference") {
    val target = Seq("the quick brown fox", "the lazy dog")
    val raw = Seq("stocks fell sharply today", "the dog barked", "")
    val m = Dsir.fit(
      docsDf(target.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*),
      docsDf(raw.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*),
      buckets = 97)
    val expT = refCensus(target, 97)
    val expR = refCensus(raw, 97)
    val got = m.bucketCounts.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).filter(_._2 > 0).toMap == expT)
    assert(got.map(g => g._1 -> g._3).filter(_._2 > 0).toMap == expR)
    val Array(tot) = m.totals.collect()
    assert(tot.getLong(0) == expT.values.sum)
    assert(tot.getLong(1) == expR.values.sum)
  }

  test("per-document log-weights match the reference, micro-nat exact") {
    val target = Seq("alpha beta gamma delta", "alpha beta again")
    val rawDocs = Seq(
      1L -> "alpha beta gamma", 2L -> "totally unrelated words here",
      3L -> "alpha beta gamma delta alpha beta", 4L -> "", 5L -> null)
    val b = 211
    val m = Dsir.fit(
      docsDf(target.zipWithIndex.map { case (t, i) => (100L + i, t) }: _*),
      docsDf(rawDocs: _*), buckets = b)
    val ct = refCensus(target, b)
    val cr = refCensus(rawDocs.map(_._2).filter(_ != null), b)
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    val got = Dsir.weighted(docsDf(rawDocs: _*), m)
      .select("doc_id", "dsir_grams", "dsir_logw_micro").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rawDocs.foreach { case (id, t) =>
      val grams = refGrams(if (t == null) "" else t)
      assert(got(id)._1 == grams.size, s"grams of doc $id")
      assert(got(id)._2 == refLogw(if (t == null) "" else t, ct, cr, nt, nr, b),
        s"logw of doc $id")
    }
  }

  test("weights order target-like > alien > raw-like; alien is neutral") {
    // Disjoint vocabularies so likeness is unambiguous (the parquet
    // fixture shares one small vocabulary across languages — useless
    // for separating distributions).
    val target = docsDf((0L until 20L).map(i =>
      (i, "alpha beta gamma delta epsilon")): _*)
    val raw = docsDf((100L until 200L).map(i =>
      (i, "one two three four five six")): _*)
    val m = Dsir.fit(target, raw)
    val probe = docsDf(
      1L -> "alpha beta gamma delta",
      2L -> "zz yy xx ww",
      3L -> "one two three four")
    val w = Dsir.weighted(probe, m)
      .select("doc_id", "dsir_logw_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(1L) > 0, s"target-like weight ${w(1L)} should be positive")
    assert(w(3L) < 0, s"raw-like weight ${w(3L)} should be negative")
    assert(w(2L) == 0,
      s"alien vocabulary (${w(2L)}) must be NEUTRAL — the JM unseen-bucket " +
        "guarantee (at B=10000 these 7 grams dodge occupied buckets)")
    assert(w(1L) > w(2L) && w(2L) > w(3L))
  }

  test("selectTopK is the deterministic weight-ordered head") {
    val docs = Tables.documents(spark, sfDir)
    val m = Dsir.fit(docs.filter(col("doc_id") < 100),
      docs.filter(col("doc_id") >= 100)).materialize()
    val raw = docs.filter(col("doc_id") >= 100)
    val all = Dsir.weighted(raw, m)
      .select("doc_id", "dsir_logw_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = all.sortBy { case (id, w) => (-w, id) }.take(10).map(_._1).toSeq
    val got = Dsir.selectTopK(raw, m, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got.sorted == expect.sorted)
  }

  test("resample: RefHash Gumbel-key parity on real data") {
    val docs = Tables.documents(spark, sfDir)
    val m = Dsir.fit(docs.filter(col("doc_id") < 100),
      docs.filter(col("doc_id") >= 100)).materialize()
    val raw = docs.filter(col("doc_id") >= 100)
    val weights = Dsir.weighted(raw, m)
      .select("doc_id", "dsir_logw_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def refSelect(seed: Long, k: Int): Set[Long] =
      weights.map { case (id, w) =>
        val h = RefHash.hash64(id, seed ^ Sampling.GumbelSalt)
        val u = (h.toDouble + 0.5) / 9.223372036854775808e18
        (id, w + Math.round(1e6 * -Math.log(-Math.log(u))))
      }.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1).toSet
    for (seed <- Seq(7L, 42L)) {
      val got = Dsir.resample(raw, m, 25, seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == refSelect(seed, 25), s"seed $seed")
    }
  }

  test("resample: the noise decides among equal weights, seed-sensitively") {
    // 200 identical documents — every weight equal, so selection is the
    // pure Gumbel draw. (On weight-spread corpora resampling is NEARLY
    // deterministic by design: Gumbel(0,1) noise only reorders docs
    // whose log-weights sit within a few nats of each other.)
    val same = docsDf((0L until 200L).map(i => (i, "same text here")): _*)
    val m = Dsir.fit(docsDf(900L -> "same text"), same, buckets = 50)
    def sel(seed: Long) = Dsir.resample(same, m, 25, seed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (a, b) = (sel(7L), sel(42L))
    assert(a.size == 25 && b.size == 25)
    assert(a != b, "equal-weight draw must be seed-sensitive")
    assert(sel(7L) == a, "same seed must redraw the same sample")
  }

  test("fitScored equals fit + weighted, model included (one-pass identity)") {
    val docs = Tables.documents(spark, sfDir)
    val target = docs.filter(col("doc_id") < 100)
    val raw = docs.filter(col("doc_id") >= 100)
    val plain = Dsir.weighted(raw, Dsir.fit(target, raw))
      .select("doc_id", "dsir_grams", "dsir_logw_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (model, scored) = Dsir.fitScored(target, raw)
    val onePass = scored
      .select("doc_id", "dsir_grams", "dsir_logw_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(onePass == plain)
    // the probe-marginal raw census equals the direct gram census
    val direct = Dsir.fit(target, raw).bucketCounts
      .select("bucket", "cr").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val marginal = model.bucketCounts.select("bucket", "cr").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(marginal == direct)
  }

  test("save -> load -> weighted is bit-parity with the fresh fit") {
    val docs = Tables.documents(spark, sfDir)
    val target = docs.filter(col("doc_id") < 100)
    val raw = docs.filter(col("doc_id") >= 100)
    val fresh = Dsir.fit(target, raw)
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Dsir.save(fresh, dir)
    val loaded = Dsir.load(spark, dir)
    assert(loaded.buckets == fresh.buckets)
    def scores(m: Dsir.Model) = Dsir.weighted(raw, m)
      .select("doc_id", "dsir_grams", "dsir_logw_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scores(loaded) == scores(fresh))
    // The saved layout is read BY NAME: a reordered re-save must still
    // load correctly (ADVICE r9 — positional reads misread silently).
    val spark2 = spark
    val reordered = spark2.read.parquet(s"$dir/bucket_counts")
      .select("cr", "ct", "bucket")
    reordered.write.mode("overwrite").parquet(s"$dir/bucket_counts_r")
    val bc = spark2.read.parquet(s"$dir/bucket_counts_r")
      .select("bucket", "ct", "cr")
    val viaReordered = Dsir.Model(bc, loaded.totals, loaded.buckets)
    assert(scores(viaReordered) == scores(fresh))
  }

  test("zero-gram documents weigh 0 and remain selectable by the draw") {
    val m = Dsir.fit(docsDf(1L -> "alpha beta"), docsDf(2L -> "gamma delta"),
      buckets = 50)
    val probe = docsDf(10L -> "", 11L -> null, 12L -> "alpha")
    val w = Dsir.weighted(probe, m)
      .select("doc_id", "dsir_grams", "dsir_logw_micro").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w(10L) == ((0L, 0L)) && w(11L) == ((0L, 0L)))
    assert(w(12L)._1 == 1L)
    // every document participates in the draw — k = all returns all
    val all = Dsir.resample(probe, m, 3, seed = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(10L, 11L, 12L))
  }

  test("hot grams pre-aggregate: probe fan-out is one row per (doc, bucket)") {
    // A document repeating one token 50 times must meet the model join
    // as ~2 rows (unigram + the repeated bigram share buckets), with
    // multiplicity in `m` — not 99 exploded rows. Weight parity with
    // the reference (which walks every occurrence) proves m carried
    // the multiplicity.
    val t = Seq.fill(50)("hot").mkString(" ")
    val target = Seq("hot cold")
    val b = 31
    val m = Dsir.fit(docsDf(100L -> "hot cold"), docsDf(0L -> t), buckets = b)
    val ct = refCensus(target, b)
    val cr = refCensus(Seq(t), b)
    val got = Dsir.weighted(docsDf(0L -> t), m)
      .select("dsir_logw_micro").head.getLong(0)
    assert(got == refLogw(t, ct, cr, ct.values.sum, cr.values.sum, b))
  }
}
