package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** X28 — bucketed tables + the co-located (exchange-free) join they
  * buy. The one big-join cost the declarative plan cannot optimize
  * away on its own is the SHUFFLE: joining two 10-TB fact tables hash-
  * exchanges both sides on the key every single run. Bucketing moves
  * that shuffle to WRITE time, once: each side is stored pre-hash-
  * partitioned (`bucketBy`) and pre-sorted (`sortBy`) on its join key,
  * so every subsequent sort-merge join of the two tables reads the
  * buckets co-located and plans ZERO Exchange on either side — the
  * standard warehouse layout for a fact table joined on the same key
  * nightly.
  *
  * Write shape: `repartition(numBuckets, key)` BEFORE the bucketed
  * write uses the SAME hash function (Murmur3 `pmod`) as the bucket
  * router, so each task holds exactly one bucket's rows → ONE file
  * per bucket. That single-file-per-bucket invariant is what lets the
  * scan also trust the `sortBy` order (Spark only elides the join
  * sort when a bucket is one file); with multiple files per bucket
  * the join keeps a per-partition sort but still drops the Exchange —
  * the part that scales with data volume.
  *
  * Read shape: bucketed scans resolve through the session catalog
  * (the bucket spec lives in table metadata, not in the files), so
  * readers use [[table]], not a path read. The table is EXTERNAL
  * (explicit `path`): the catalog entry is per-session metadata; the
  * parquet layout on disk is the durable artifact.
  *
  * 100 TB shape: numBuckets sized so a bucket is a few hundred MB
  * (e.g. 4096 buckets for 1 TB of post-prune key+payload); both
  * tables MUST agree on (bucket column = join key, numBuckets) — a
  * mismatch silently degrades to a plain shuffled join, which the
  * spec's zero-Exchange assertion exists to catch. */
object Bucketed {

  /** Write `df` as an external bucketed+sorted parquet table at
    * `path`, registered as `table` in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit = {
    require(numBuckets >= 1, s"numBuckets ($numBuckets) must be >= 1")
    df.repartition(numBuckets, col(bucketCol))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Sort-merge join pinned by hint — the strategy a 100 TB fact-fact
    * join takes anyway (broadcast is off the table at that size; the
    * hint keeps the toy-scale demo on the plan being demonstrated).
    * With both inputs bucketed on their join key into the same bucket
    * count, this plans with ZERO Exchange. */
  def colocatedJoin(left: DataFrame, right: DataFrame,
                    condition: Column,
                    joinType: String = "inner"): DataFrame =
    left.hint("merge").join(right, condition, joinType)
}
