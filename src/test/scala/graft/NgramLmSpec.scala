package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.NgramLm

class NgramLmSpec extends SparkSpec {

  private def refModel = NgramLm.train(df(Seq(
      Row(1L, "a b a b c")),
    "doc_id BIGINT, text STRING"))

  test("hand-computed counts: unigrams, bigrams, totals") {
    val m = refModel
    val uni = m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    val big = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val t = m.totals.collect().head
    assert(t.getLong(0) == 5L && t.getLong(1) == 3L)
  }

  test("hand-computed micro-nats: seen ratio, backoff, short/empty docs") {
    val docs = df(Seq(
        Row(10L, "a b c"),   // (a,b): ln(2/2)=0; (b,c): round(1e6 ln(1/2)) = -693147
        Row(11L, "z q"),     // backoff, OOV w2: -916291 + round(1e6 ln(1/8)) = -2995733
        Row(12L, "hello"),   // 1 token: no grams
        Row(13L, null),      // null text: no grams
        Row(14L, "z c")),    // backoff, in-vocab w2: -916291 + round(1e6 ln(2/8))
      "doc_id BIGINT, text STRING")
    val out = NgramLm.scored(docs, refModel)
      .select("doc_id", "lm_grams", "lm_hits", "lm_logp_micro", "lm_band")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // Default head cut is ppl 100 (-4 605 170/gram) — all scored docs
    // here sit above it; threshold ordering is pinned separately below.
    assert(out(10L) == ((2L, 2L, -693147L, "head")))
    assert(out(11L) == ((1L, 0L, -2995733L, "head")))
    assert(out(12L) == ((0L, 0L, 0L, "empty")))
    assert(out(13L) == ((0L, 0L, 0L, "empty")))
    // ln(0.4 * (1+1)/(5+3)) split: -916291 + round(1e6·ln 0.25)
    assert(out(14L) == ((1L, 0L, -916291L - 1386294L, "head")))
  }

  private def refModel3 = NgramLm.train(df(Seq(
      Row(1L, "a b a b c")),
    "doc_id BIGINT, text STRING"), order = 3)

  test("trigram counts: census of the adjacent triples") {
    val tri = refModel3.trigrams.get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(tri == Map(("a", "b", "a") -> 1L, ("b", "a", "b") -> 1L,
      ("a", "b", "c") -> 1L))
    // The lower-order tables are the SAME censuses as the bigram model.
    assert(refModel3.unigrams.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("trigram micro-nats: hit, one-level backoff, two-level backoff") {
    val docs = df(Seq(
        Row(10L, "a b a"),   // c3(a,b,a)=1 / c2(a,b)=2 -> round(1e6 ln .5)
        Row(11L, "b a b c"), // (b,a,b): ln(1/1)=0; (a,b,c): ln(1/2)
        Row(12L, "z a b"),   // unseen tri, bigram (a,b)=2 / c(a)... c(w2=a)=2
        Row(13L, "z q c"),   // both unseen: 2·Backoff + ln((1+1)/(5+3))
        Row(14L, "a b"),     // 2 tokens: no trigrams
        Row(15L, null)),
      "doc_id BIGINT, text STRING")
    val out = NgramLm.scored(docs, refModel3)
      .select("doc_id", "lm_grams", "lm_hits", "lm_logp_micro", "lm_band")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(10L) == ((1L, 1L, -693147L, "head")))
    assert(out(11L) == ((2L, 2L, -693147L, "head")))
    // -916291 + round(1e6·ln(c2(a,b)/c1(a))) = -916291 + ln(2/2) = -916291
    assert(out(12L) == ((1L, 0L, -916291L, "head")))
    // 2·(-916291) + round(1e6·ln((1+1)/(5+3))) = -1832582 - 1386294
    assert(out(13L) == ((1L, 0L, -3218876L, "head")))
    assert(out(14L) == ((0L, 0L, 0L, "empty")))
    assert(out(15L) == ((0L, 0L, 0L, "empty")))
  }

  test("order-3 save -> load -> scored is bit-parity; order survives the layout") {
    val docs = Tables.documents(spark, sfDir)
    val m3 = NgramLm.train(docs.filter(col("doc_id") < 100), order = 3)
    val dir = java.nio.file.Files.createTempDirectory("lm3_model").toString
    NgramLm.save(m3, dir)
    val loaded = NgramLm.load(spark, dir)
    assert(loaded.trigrams.isDefined, "trigrams/ dir must mark an order-3 model")
    def scores(m: NgramLm.Model) =
      NgramLm.scored(docs.filter(col("doc_id") >= 100), m)
        .select("doc_id", "lm_grams", "lm_hits", "lm_logp_micro").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(scores(loaded) == scores(m3))
    // A bigram save must load back WITHOUT trigrams (no silent upgrade).
    val dir2 = java.nio.file.Files.createTempDirectory("lm2_model").toString
    NgramLm.save(NgramLm.train(docs.filter(col("doc_id") < 100)), dir2)
    assert(NgramLm.load(spark, dir2).trigrams.isEmpty)
  }

  test("5-gram micro-nats: every backoff level of the four-level CASE") {
    // Reference "a b c d e a b c d f": 5-gram census {abcde:1, bcdea:1,
    // cdeab:1, deabc:1, eabcd:1, abcdf:1}; 4-gram c4(abcd)=2; etc.
    val ref5 = NgramLm.train(df(Seq(Row(1L, "a b c d e a b c d f")),
      "doc_id BIGINT, text STRING"), order = 5)
    assert(ref5.order == 5)
    val docs = df(Seq(
        Row(10L, "a b c d e"),  // 5-gram hit: c5/c4 = 1/2 → round(1e6 ln .5)
        Row(11L, "z b c d e"),  // unseen 5-gram, 4-gram (b c d e)=1/c3(bcd)=2
                                //   → 1·B + round(1e6 ln .5)
        Row(12L, "z y c d e"),  // 3-gram (c d e)=1 / c2(cd)=2 → 2·B + ln .5
        Row(13L, "z y x d e"),  // 2-gram (d e)=1 / c1(d)=2 → 3·B + ln .5
        Row(14L, "z y x w e"),  // full miss: 4·B + ln((c1(e)+1)/(10+6))
        Row(15L, "a b c d")),   // 4 tokens: zero 5-grams
      "doc_id BIGINT, text STRING")
    val out = NgramLm.scored(docs, ref5)
      .select("doc_id", "lm_grams", "lm_hits", "lm_logp_micro", "lm_band")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val b = NgramLm.BackoffMicro
    val ln05 = -693147L // round(1e6 ln 0.5)
    assert(out(10L) == ((1L, 1L, ln05, "head")))
    assert(out(11L) == ((1L, 0L, b + ln05, "head")))
    assert(out(12L) == ((1L, 0L, 2 * b + ln05, "head")))
    assert(out(13L) == ((1L, 0L, 3 * b + ln05, "head")))
    // 4·B + round(1e6·ln((1+1)/(10+6))) = 4·B + round(1e6·ln .125)
    assert(out(14L) == ((1L, 0L, 4 * b - 2079442L, "middle")))
    assert(out(15L) == ((0L, 0L, 0L, "empty")))
  }

  test("order-5 save -> load -> scored is bit-parity; grams4/5 mark the order") {
    val docs = Tables.documents(spark, sfDir)
    val m5 = NgramLm.train(docs.filter(col("doc_id") < 100), order = 5)
    val dir = java.nio.file.Files.createTempDirectory("lm5_model").toString
    NgramLm.save(m5, dir)
    val loaded = NgramLm.load(spark, dir)
    assert(loaded.order == 5, "grams4/ + grams5/ must mark an order-5 model")
    def scores(m: NgramLm.Model) =
      NgramLm.scored(docs.filter(col("doc_id") >= 100), m)
        .select("doc_id", "lm_grams", "lm_hits", "lm_logp_micro").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(scores(loaded) == scores(m5))
  }

  test("ppl derives from the integer sum; bands order by thresholds") {
    val docs = df(Seq(Row(10L, "a b c")), "doc_id BIGINT, text STRING")
    val r = NgramLm.scored(docs, refModel,
        headMicro = -300000L, tailMicro = -400000L)
      .select("lm_ppl", "lm_band").collect().head
    // avg = -693147/2e6 nats → ppl = exp(0.3465735) = 1.414; the sum
    // (-693147) misses the head cut (-600000) but clears the tail cut
    // (-800000) — the cross-multiply orders bands correctly.
    assert(r.getDouble(0) == 1.414)
    assert(r.getString(1) == "middle")
  }

  test("reference-distribution text outscores shuffled-alphabet garbage") {
    val docs = Tables.documents(spark, sfDir)
    val model = NgramLm.train(docs.filter(col("doc_id") < 300))
    val probe = docs.filter(col("doc_id") >= 300)
      .unionByName(docs.filter(col("doc_id") < 3)
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", translate(col("text"),
          "abcdefghijklmnopqrstuvwxyz", "zyxwvutsrqponmlkjihgfedcba")))
    val out = NgramLm.scored(probe, model)
      .select(col("doc_id"),
        (col("lm_logp_micro").cast("double") / col("lm_grams")).as("avg"))
      .filter(col("lm_grams") > 0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (garbage, real) = out.partition(_._1 >= 10000L)
    assert(garbage.nonEmpty && real.nonEmpty)
    // Every letter-shuffled doc scores below the mean real doc: its
    // grams can only hit via backoff, never the bigram table.
    val realMean = real.values.sum / real.size
    garbage.values.foreach(g => assert(g < realMean))
  }

  test("saved model scores identically to the fresh one (save → load → scored)") {
    // The persisted-LM nightly shape: counts trained once, saved to
    // parquet, loaded back for scoring — every integer column must be
    // bit-identical to the in-memory model's output.
    val docs = Tables.documents(spark, sfDir)
    val model = NgramLm.train(docs.filter(col("doc_id") < 300))
    val probe = docs.filter(col("doc_id") >= 300)
    def scores(m: NgramLm.Model) = NgramLm.scored(probe, m)
      .select("doc_id", "lm_grams", "lm_hits", "lm_logp_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val fresh = scores(model)
    val dir = java.nio.file.Files.createTempDirectory("lm_save").toString
    NgramLm.save(model, dir)
    val loaded = scores(NgramLm.load(spark, dir))
    assert(fresh.nonEmpty && loaded == fresh)
  }

  test("in-reference text lands every gram in the bigram table") {
    val docs = Tables.documents(spark, sfDir)
    val model = NgramLm.train(docs.filter(col("doc_id") < 300))
    val replant = docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 20000)
    val out = NgramLm.scored(replant, model)
      .select("lm_grams", "lm_hits").collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(out.exists(_.getLong(0) > 0))
  }
}
