package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** S10 — STREAMING benchmark decontamination against a persisted
  * [[graft.ext.Dedup.saveBenchShingles]] index: the X8 containment
  * gate in a form a structured stream can run — completing the
  * fit-once/serve-streaming story for decontamination the way s8 did
  * for BM25 and s9 for adaptive thresholds (`tonight's crawl must not
  * contain the eval suite` is precisely a nightly-shard gate).
  *
  * Why this needs its own shape: the batch path ([[graft.ext.Dedup
  * .contaminationPairs]]) explodes corpus shingles and AGGREGATES the
  * per-(doc, bench) intersection — a stateful aggregation a stream
  * cannot run in append mode. But containment is a PER-ROW property
  * once the benchmark side is arrays: each arriving document computes
  * its distinct gram-hash set in one native traversal
  * ([[graft.functions.NGramHashes]] over the [[Dedup.normText]] tokens
  * — byte-identical hashes to the batch `wordShingles` explode: same
  * space-joined slices, same xxhash64 seed), and ONE stream-static
  * LEFT ANTI join against the |benchmark|-row gram-set frame carries
  * the EXACT containment verify as its non-equi condition —
  * `round(|intersect| / bn, 4) >= minContainment`, the batch
  * comparison token for token. No aggregation, no state, no shuffle
  * on the stream side (the s6 chained-anti-join discipline, in one
  * join).
  *
  * Scale: the static side is the benchmark suite — dim-sized BY
  * DEFINITION (eval sets are thousands of documents against a 100 TB
  * corpus) — so Spark broadcasts it and the stream pays
  * |batch| × |bench| interset checks, each bounded by the document's
  * gram count. The per-row gram array lives only inside the
  * projection (never materialized to state or shuffle).
  *
  * Null/short documents have no 4-grams (empty or null gram set), can
  * match nothing, and always SURVIVE — exactly the batch semantics
  * (they produce no shingle rows). Drop-set parity with the batch
  * detector and live MemoryStream ≡ batch replay are pinned in
  * StreamingDecontamSpec; the registered `s10_stream_decontam` is the
  * batch replay, hash-matched against the complement of the SAME
  * containment CTE the x8 oracles use. */
object StreamingDecontam {

  /** The benchmark side, derived ONCE from the saved X8 artifact:
    * (bench key, sorted distinct gram-hash array, gram count). A
    * driver-free plan over the parquet — collect_set is safe here
    * because a single benchmark document's gram count is bounded by
    * its own length (the per-group state of this aggregate is one
    * eval document, never corpus-scaled). */
  def benchGramSets(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    val params = spark.read.parquet(s"$dir/params")
      .select("n", "bench_key").head()
    val benchKey = params.getString(1)
    spark.read.parquet(s"$dir/grams")
      .groupBy(col(benchKey).as("__bench_id"))
      .agg(collect_set(col("g")).as("__bgrams"))
      .join(spark.read.parquet(s"$dir/sizes")
        .select(col(benchKey).as("__bench_id"), col("__bn")), "__bench_id")
  }

  /** Per-row distinct gram-hash set — ONE native traversal, hash-
    * identical to [[Dedup.wordShingles]]' explode by construction. */
  private def gramSet(textCol: String, n: Int): Column =
    array_distinct(graft.functions.TextFunctions.ngramHashes(
      split(Dedup.normText(col(textCol)), "\\s+"), n))

  /** Survivors of the containment gate: documents whose gram set
    * contains ≥ `minContainment` of ANY benchmark document's grams are
    * dropped; everything else passes through unchanged. Stream-safe:
    * one stateless projection + one stream-static anti join. `n` must
    * match the width the index was shingled at — pass the value
    * [[graft.ext.Dedup.contaminationAgainst]] would assert
    * (`expectN`); the registered query reads it from the params row. */
  def contamDropStreamAgainst(stream: DataFrame, bench: DataFrame,
                              textCol: String = "text", n: Int = 4,
                              minContainment: Double = 0.8): DataFrame = {
    val withGrams = stream.withColumn("__grams", gramSet(textCol, n))
    withGrams
      .join(bench,
        round(size(array_intersect(col("__grams"), col("__bgrams")))
          * lit(1.0) / col("__bn"), 4) >= lit(minContainment),
        "left_anti")
      .drop("__grams")
  }
}
