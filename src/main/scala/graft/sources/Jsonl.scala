package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** X29 — JSON Lines source/sink. JSONL (one JSON document per line)
  * is the de-facto interchange format for LLM corpora — raw crawl
  * dumps, published datasets, and tokenizer pipelines all speak it —
  * so an engine that curates training data must read and write it
  * losslessly, not just parquet.
  *
  * Write shape: `numShards` output files via ONE hash repartition on
  * the (unique) key column — the same pmod sharding contract as the
  * curated-corpus writer ([[graft.ext.Curation.shardOf]] rationale):
  * a pure row function, so file CONTENTS are byte-stable for a given
  * `numShards` regardless of cluster size or input partitioning, and
  * uniform (no single-task funnel). Files stay UNCOMPRESSED by
  * default: gzip is not splittable — one 5-GB .json.gz is one task
  * for every downstream reader; at 100 TB prefer many moderate
  * uncompressed shards (or a splittable codec) over fewer compressed
  * ones.
  *
  * Read shape: the schema is REQUIRED — Spark's JSON schema inference
  * is a full extra pass over the data (a second 100-TB scan before
  * the first real one), and inference can silently widen or miss
  * fields that happen to be absent in the sampled partitions. Reads
  * run FAILFAST: the default PERMISSIVE mode turns a corrupt line
  * into a row of nulls, which at corpus scale is silent data loss —
  * a malformed shard should kill the job with a filename, not leak
  * null documents into training.
  *
  * Losslessness contract: exact for string / integral / boolean /
  * decimal columns (strings round-trip byte-identically through JSON
  * escaping — embedded newlines become \n, so one-doc-per-line holds
  * for any text). Binary columns are base64'd by Spark's JSON writer
  * (lossless, 4/3 size); raw doubles are formatted in shortest-
  * round-trip form (value-lossless, but prefer the house integer
  * micro-unit columns anyway). A field that is NULL is omitted from
  * its line and reads back as NULL under the explicit schema. */
object Jsonl {

  /** Write `df` as `numShards` JSONL files under `dir` (overwrite). */
  def write(df: DataFrame, dir: String, numShards: Int = 1,
            keyCol: String = "doc_id"): Unit = {
    require(numShards >= 1, s"numShards ($numShards) must be >= 1")
    // repartition on the raw key: the router is pmod(murmur3(key), n)
    // — a pure row function (byte-stable shard contents) AND uniform.
    // Hashing a pre-computed pmod residue instead would re-hash n
    // small ints into n buckets, which collides (empty + doubled
    // shards) for small n.
    df.repartition(numShards, col(keyCol))
      // Key-sort within each shard: without it, intra-file line order
      // depends on shuffle fetch order and the byte-stable-contents
      // claim above would only hold set-wise (the Compact lesson).
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").json(dir)
  }

  /** Read a JSONL directory under an explicit schema, failing fast on
    * any malformed line. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(dir)

  def read(spark: SparkSession, dir: String, ddl: String): DataFrame =
    read(spark, dir, StructType.fromDDL(ddl))
}
