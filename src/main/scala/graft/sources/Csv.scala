package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** X32 — CSV source/sink, completing the interchange matrix next to
  * [[Jsonl]] (parquet for the engine's own artifacts, JSONL for LLM
  * corpora, CSV for everything a warehouse/spreadsheet/vendor exports).
  * CSV is the format most likely to corrupt silently — delimiters,
  * quotes, and newlines INSIDE values — so the defaults here are the
  * lossless ones, and the registered round-trip query hash-verifies
  * content (including embedded separators and non-BMP text) against
  * the original parquet census.
  *
  * Write shape: the [[Jsonl.write]] sharding contract — `numShards`
  * files via ONE hash repartition on the unique key (pure row
  * function: byte-stable shard contents, uniform, no single-task
  * funnel). Values containing the delimiter, quotes, or newlines are
  * quoted and escaped; whitespace is NOT trimmed (Spark's write-side
  * `ignore*WhiteSpace` defaults are true — they silently eat trailing
  * spaces, measured in CsvSpec).
  *
  * NULL vs empty string — the CSV trap, solved with a sentinel: CSV
  * has one empty-field representation for two values, and Spark's
  * read path folds whatever matches `nullValue` (default: the empty
  * string) to NULL — so out of the box `""` comes back NULL and the
  * round trip is lossy (measured). Here NULL writes as the U+0001
  * control character and reads back through the same `nullValue`
  * sentinel, leaving the quoted empty string to mean exactly "" —
  * both verified byte-for-byte in CsvSpec. Contract: text columns
  * must not CONTAIN a bare U+0001 (a value that IS the sentinel would
  * read back NULL); control characters do not survive any sane text
  * pipeline anyway, and the registered round-trip census would catch
  * a violation as a hash break.
  *
  * Read shape: schema REQUIRED (inference = an extra full pass that
  * can silently widen types — the [[Jsonl]] rationale), FAILFAST (a
  * malformed shard must kill the job, not leak null rows), and
  * `multiLine = true` because quoted embedded newlines span physical
  * lines. multiLine is the documented SCALE TRADE-OFF: a multiLine
  * CSV file is NOT splittable (one file = one task), so at 100 TB a
  * CSV landing zone should be many moderate shards — which the write
  * side produces — and the first pipeline step should convert to
  * parquet/JSONL; this source exists for interchange, not as the
  * steady-state format. Header on: the file should carry its own
  * column names for the humans CSV exists for. */
object Csv {

  /** The NULL sentinel (see object doc): a control char no clean text
    * contains, never a string real data could equal. */
  val NullSentinel = "\u0001"

  /** Write `df` as `numShards` CSV files under `dir` (overwrite). */
  def write(df: DataFrame, dir: String, numShards: Int = 1,
            keyCol: String = "doc_id"): Unit = {
    require(numShards >= 1, s"numShards ($numShards) must be >= 1")
    df.repartition(numShards, col(keyCol))
      // Key-sort within each shard (the Compact lesson: byte-stable
      // contents require a deterministic intra-file order).
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "\"\"") // "" stays distinct from NULL
      .csv(dir)
  }

  /** Read a CSV directory under an explicit schema: FAILFAST,
    * multiLine (quoted embedded newlines), header skipped by name. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .option("multiLine", "true")
      .option("nullValue", NullSentinel)
      .csv(dir)

  def read(spark: SparkSession, dir: String, ddl: String): DataFrame =
    read(spark, dir, StructType.fromDDL(ddl))
}
