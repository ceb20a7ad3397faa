package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** X34 — ORC source/sink, completing the interchange matrix's
  * warehouse leg (parquet for the engine's own artifacts, JSONL for
  * LLM corpora, CSV for spreadsheet/vendor exports, ORC for the
  * Hive/Trino estates that standardized on it). A curation engine
  * that can't read the warehouse's native columnar format forces a
  * copy-convert step in front of every ingest; this source removes
  * it.
  *
  * Why ORC needs none of the CSV/JSONL defenses: it is binary and
  * self-describing — NULL is a real value (no sentinel), strings are
  * length-prefixed (no delimiter/quote/newline corruption), and the
  * file carries its own schema, so there is no inference pass and no
  * silent type widening. The failure mode it DOES have is schema
  * drift between what the file carries and what the pipeline expects,
  * so [[read]] takes the expected schema and fails loudly on any
  * (name, type) mismatch instead of letting Spark cast its way
  * through.
  *
  * Scale shape: ORC is splittable at stripe granularity even though
  * stripes are compressed (compression is per-stripe, unlike a
  * gzipped text file where one file = one task), and every stripe
  * carries min/max column statistics, so predicate pushdown skips
  * whole stripes at scan time — `spark.sql.orc.filterPushdown` is on
  * by default and OrcSpec pins that our scans actually carry
  * `PushedFilters`. Write-side sharding follows the [[Jsonl.write]]
  * contract: `numShards` files via ONE hash repartition on the unique
  * key — byte-stable shard contents, uniform, no single-task funnel. */
object Orc {

  /** Write `df` as `numShards` ORC files under `dir` (overwrite).
    * Key-sorted within each shard: without the sort, intra-file row
    * order depends on shuffle fetch order and the byte-stability
    * claim would only hold set-wise (the Compact lesson); sorted
    * files also keep stripe min/max stats tight on the key. */
  def write(df: DataFrame, dir: String, numShards: Int = 1,
            keyCol: String = "doc_id"): Unit = {
    require(numShards >= 1, s"numShards ($numShards) must be >= 1")
    df.repartition(numShards, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").orc(dir)
  }

  /** Strip nullability RECURSIVELY (field nullable, array
    * containsNull, map valueContainsNull): ORC marks everything
    * nullable at every level, so a faithful round trip of a
    * non-nullable nested type must not read as drift. */
  private def denull(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = denull(f.dataType), nullable = true)))
    case a: ArrayType =>
      a.copy(elementType = denull(a.elementType), containsNull = true)
    case m: MapType => m.copy(keyType = denull(m.keyType),
      valueType = denull(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Read an ORC directory, asserting the files' own schema matches
    * `expected` on (name, dataType) per field — nullability excluded
    * at EVERY nesting level ([[denull]]) because ORC marks every
    * column nullable. A drifted table fails here with both schemas in
    * the message, not 500 stages later with a cast artifact. */
  def read(spark: SparkSession, dir: String, expected: StructType): DataFrame = {
    val df = spark.read.orc(dir)
    val got = df.schema.fields.map(f => (f.name, denull(f.dataType))).toSeq
    val want = expected.fields.map(f => (f.name, denull(f.dataType))).toSeq
    require(got == want,
      s"ORC schema drift under $dir: file carries ${df.schema.toDDL}, " +
        s"pipeline expects ${expected.toDDL}")
    df
  }

  def read(spark: SparkSession, dir: String, ddl: String): DataFrame =
    read(spark, dir, StructType.fromDDL(ddl))
}
