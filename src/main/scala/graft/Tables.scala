package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical loaders for the driver-provided testdata tables
  * (see /root/repo/TESTDATA.md). One parquet file per table.
  *
  * At 100 TB these would be partitioned parquet/iceberg tables; the
  * loader stays a plain `spark.read.parquet` so DataSource V2 keeps
  * predicate pushdown + column pruning on every downstream check
  * (filters reach the scan — verified via `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // NOTE: sessions reading `events` need spark.sql.legacy.parquet.nanosAsLong
  // (TIMESTAMP(NANOS) in the file) — set at session construction via
  // [[Sessions.builder]], never mutated here.
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and floor-divide to
    * microseconds — identical to DuckDB's TIMESTAMP_NS → TIMESTAMP cast, so
    * oracle comparisons on derived timestamps agree. */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events").withColumn(
      "ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
