package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X41 — PMI collocation mining: the corpus's statistically-bound word
  * pairs ("new york", "machine learning") by pointwise mutual
  * information — the classic corpus-analysis primitive behind tokenizer
  * merge planning (which pairs deserve a single token), stopword/
  * boilerplate phrase discovery, and domain-vocabulary profiling
  * (Church & Hanks 1990).
  *
  *   pmi(w1, w2) = ln( P(w1 w2) / (P(w1)·P(w2)) )
  *               = ln( (c12/Nb) / ((c1/Nu)·(c2/Nu)) )
  *
  * Float discipline (the x15/x16/x24 micro-nat pattern): ONE `ln` per
  * surviving pair, rounded ONCE to integer micro-nats, with the
  * argument built by a PINNED association of IEEE-exact multiplies and
  * divides (`((c12·Nu)/Nb) · (Nu/c1) / c2` — both engines evaluate the
  * identical parse tree, so the only engine exposure is the ln itself,
  * slack-audited like the other micro-nat lanes). `minCount` does the
  * statistical honest-signal cut (a hapax pair has sky-high PMI and no
  * evidence) AND bounds the scored frame.
  *
  * Scale shape: one token explode → unigram census, one bigram explode
  * (codegen'd shifted-slice `arrays_zip`, the NgramLm extraction — no
  * interpreted HOF) → pair census with map-side combine; the ≥minCount
  * survivors join the unigram census TWICE co-keyed on the word (the
  * vocabulary is corpus-scale in the adversarial case, so these are
  * shuffle equi-joins, never a pinned broadcast); (Nu, Nb) is a one-row
  * broadcast cross ([[Mixing]] totals discipline); the top-k is
  * orderBy+limit — TakeOrderedAndProject (per-partition top-k + k-row
  * driver merge), never a global sort.
  */
object Collocations {

  /** Adjacent-pair structs of a MATERIALIZED token array — the NgramLm
    * codegen'd shifted-slice extraction, re-exported for callers (and
    * the slack audit) outside the ext package. */
  def pairStructs(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    NgramLm.gramStructs(toks, 2)

  def pmiPairs(docs: DataFrame, textCol: String = "text",
               k: Int = 50, minCount: Long = 5L): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    require(minCount >= 1, s"minCount ($minCount) must be >= 1")
    val toks = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))

    val uni = toks.select(explode(col("__toks")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val big = toks
      .select(explode(NgramLm.gramStructs(col("__toks"), 2)).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    // (Nu, Nb) in ONE aggregate over the token arrays — summing the
    // unigram census would re-shuffle, and summing `big` would
    // undercount (minCount already filtered it).
    val totals = toks.agg(
      sum(size(col("__toks"))).cast("long").as("__nu"),
      sum(greatest(size(col("__toks")) - 1, lit(0))).cast("long").as("__nb"))

    big
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro",
        round(log(((col("c12") * lit(1.0) * col("__nu")) / col("__nb")) *
          ((col("__nu") * lit(1.0)) / col("c1")) / col("c2"))
          * lit(1000000.0), 0).cast("long"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
