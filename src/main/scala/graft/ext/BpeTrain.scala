package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X53 — BPE merge TRAINING (VERDICT r12 missing #1: X3d counts with a
  * GPT-2-shaped regex and X41 mines merge candidates, but nothing
  * produced a vocab artifact — this is the iterative pair-merge loop
  * itself, Sennrich et al. 2016, run with the engine's fit-once
  * machinery).
  *
  * The classic algorithm on the word-frequency table: start from
  * characters, repeatedly take the most frequent ADJACENT symbol pair
  * (weighted by word count) and fuse it everywhere, k times. Exactness
  * discipline: counts are integers, the argmax is pinned to the
  * (count DESC, left ASC, right ASC) total order, and the fuse step is
  * a non-rescanning left-to-right PLAIN string replace — identical
  * greedy semantics in Spark (`StringReplace`/`UTF8String.replace`)
  * and DuckDB (`replace`), so the k-step merge trajectory replays
  * bit-for-bit as chained CTEs (the x30 TRAINING-is-exact discipline).
  *
  * Symbol encoding: every symbol is wrapped U+0001·sym·U+0002 and the
  * sequence is the wrapped symbols' concatenation. The wrap makes
  * adjacent-pair replacement SOUND where a bare separator is not:
  * `[a,b,a,b]` fuses BOTH pairs (a single shared separator would give
  * only alternate occurrences), `[a,a,a]` fuses greedily left-to-right
  * to `[aa,a]` — exactly the reference algorithm — and a multi-char
  * symbol can never false-match inside a neighbor (`(b,c)` does not
  * fire on `[ab,c]`). The census is restricted to lowercase-alphabetic
  * words, so the sentinels cannot occur in the data (the x32 CSV
  * U+0001 discipline).
  *
  * Scale shape: ONE corpus pass builds the word census; the top-W cut
  * rides a TakeOrdered (no global sort); every merge step is one
  * bounded aggregate over the W-row word table (explode adjacent
  * pairs → partial-agg sum → argmax fetch of ONE row) + a map-only
  * fuse — the [[Perceptron]] / IvfIndex k-scan posture. The corpus is
  * touched once; training cost is k × O(W · avg word length),
  * independent of corpus size. */
object BpeTrain {

  private val S = "\u0001" // symbol open sentinel
  private val E = "\u0002" // symbol close sentinel

  /** Word-frequency census: lowercase-alphabetic words only (the
    * sentinel-safety contract), top `maxWords` by (count DESC, word
    * ASC) — a deterministic TakeOrdered cut. */
  def wordCensus(docs: DataFrame, maxWords: Int,
                 textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(lower(col(textCol))))
        .as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /** The initial symbol sequence: each character wrapped. DOTALL —
    * without (?s) a line terminator in the input would pass through
    * UNWRAPPED and silently corrupt the symbol boundaries ([[segment]]
    * is a public API; [[wordCensus]]'s `^[a-z]+$` filter protects only
    * the training path). Sentinel characters (U+0001/U+0002) in the
    * input remain unsupported, as in the x32 CSV contract. */
  private def charSeq(word: Column): Column =
    regexp_replace(word, "(?s)(.)", s"$S$$1$E")

  /** Unwrap a sequence back to its symbol array: strip the outer
    * sentinels, split on the close·open boundary. */
  def symbolsOf(seq: Column): Column =
    split(seq.substr(lit(2), length(seq) - 2), s"$E$S")

  /** One merge step's pair census over the current sequence table:
    * adjacent (left, right) symbol pairs weighted by word count. */
  private def pairCounts(seqs: DataFrame): DataFrame =
    seqs
      .select(col("cnt"), symbolsOf(col("seq")).as("__syms"))
      .filter(size(col("__syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("__syms")) - 2),
          i => struct(element_at(col("__syms"), i + 1).as("l"),
            element_at(col("__syms"), i + 2).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("cnt")).as("pc"))

  private def fuse(seq: Column, l: String, r: String): Column =
    replace(seq, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))

  /** The k-step merge trajectory: `(step, left, right, merged,
    * pair_count)` — one row per learned merge, the vocab artifact's
    * rows. Stops early (fewer rows) if no pair remains. Each step is
    * one bounded aggregate + a ONE-row argmax fetch over the W-row
    * table. */
  def fitMerges(words: DataFrame, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 64,
      s"merges ($merges) must be in [1, 64] — each step is an aggregate pass")
    val spark = words.sparkSession
    // The word table is bounded (wordCensus' maxWords); pin it so the
    // k steps re-scan W tiny rows, not the corpus census (the X15
    // localCheckpoint persisted-model posture).
    var seqs = words.select(col("word"), col("cnt"),
      charSeq(col("word")).as("seq")).localCheckpoint(true)
    val out = Vector.newBuilder[(Long, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val best = pairCounts(seqs)
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect() // bounded: ONE (l, r, pc) row
      if (best.isEmpty) done = true
      else {
        val (l, r, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((step.toLong, l, r, l + r, pc))
        val next = seqs.withColumn("seq", fuse(col("seq"), l, r))
          .localCheckpoint(true)
        // Release the superseded pin — a 64-merge fit would otherwise
        // leave 65 checkpointed RDDs in the block manager for the JVM
        // lifetime (the IvfIndex/PqIndex per-iteration discipline).
        seqs.unpersist()
        seqs = next
        step += 1
      }
    }
    seqs.unpersist()
    import spark.implicits._
    out.result().toDF("step", "left", "right", "merged", "pair_count")
      .orderBy("step")
  }

  /** Persist / load the merge list (the X15/X24 persisted-model
    * contract: train once, tokenize everywhere). */
  def saveMerges(merges: DataFrame, dir: String): Unit =
    merges.coalesce(1).write.mode("overwrite").parquet(dir)

  def loadMerges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Apply a fitted merge list to a word column — the TOKENIZE half:
    * the merges replay in training order (BPE's apply rule), then the
    * wrapped sequence unwraps to the symbol array. Map-only; the merge
    * list is bounded by k, so it rides the plan as literals. */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    symbolsOf(merges.foldLeft(charSeq(lower(word))) {
      case (acc, (l, r)) => fuse(acc, l, r)
    })
}
