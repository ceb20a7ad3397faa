package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X35 — date-partitioned event storage: the warehouse time-series
  * layout (`dir/dt=YYYY-MM-DD/part-*.parquet`). The point at 100 TB is
  * PARTITION PRUNING: an event store grows forever, but every real
  * query carries a time predicate — `dt` as a Hive partition column
  * turns that predicate into directory listing (the scan's
  * `PartitionFilters`), so a one-week query over a three-year store
  * reads 7/1095 of the data before a single row is decoded. Pruning
  * reaching the scan is pinned in TimePartitionedSpec, not assumed.
  *
  * Write shape: `dt` derives from the timestamp in the SESSION
  * TIMEZONE (this engine pins UTC in [[graft.Sessions]] — a
  * TZ-floating day boundary would shuffle ~4% of rows between
  * neighboring partitions depending on where the job ran). File count
  * per day is controlled the x10-writer way: ONE repartition on
  * (dt, pmod(hash(key), filesPerDay)) so each day fans out across at
  * most `filesPerDay` writer tasks — no single-task day, no
  * thousand-small-files day, and contents are byte-stable for a given
  * `filesPerDay` regardless of input partitioning (pure row router).
  *
  * Append-by-day operation: a daily ingest OVERWRITES its own `dt=`
  * directory only (dynamic partition overwrite), never the store —
  * re-running a day is idempotent, other days untouched (pinned in
  * the spec). */
object TimePartitioned {

  /** Write `df` under `dir` partitioned by the day of `tsCol`.
    * `overwriteDays`: true = replace ONLY the partition directories
    * present in `df` (the daily-ingest mode); false = replace the
    * whole store. */
  def writeDaily(df: DataFrame, dir: String, tsCol: String = "ts",
                 keyCol: String = "event_id", filesPerDay: Int = 1,
                 overwriteDays: Boolean = false): Unit = {
    require(filesPerDay >= 1, s"filesPerDay ($filesPerDay) must be >= 1")
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("dt"), pmod(hash(col(keyCol)), lit(filesPerDay)))
      // Key-sort within each writer task: without it, intra-file row
      // order depends on shuffle fetch order and the byte-stability /
      // per-day-idempotence contract would only hold set-wise (the
      // Compact lesson). Sorting by (dt, key) also restores parquet
      // min/max pruning on the key inside each day.
      .sortWithinPartitions(col("dt"), col(keyCol))
      .write.mode("overwrite")
      // Per-WRITE option, not the session conf: mutating the shared
      // session conf races a concurrent writer on the same session —
      // a 'static' set by one call between another's set and execute
      // would turn a one-day overwrite into a whole-store wipe.
      .option("partitionOverwriteMode",
        if (overwriteDays) "dynamic" else "static")
      .partitionBy("dt").parquet(dir)
  }

  /** Read the store; `dt` comes back as a DATE partition column
    * (Spark's partition-value type inference) and any predicate on it
    * prunes at listing time — string date literals cast and still
    * prune. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
