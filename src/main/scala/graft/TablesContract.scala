package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Testdata-contract canary.
  *
  * The driver regenerates `/root/testdata` between rounds, and a silent
  * schema drift (round 7: `events.ts` flipped TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)) previously surfaced only as five downstream
  * analysis errors. This check loads each table's schema at the given
  * scale-factor dir and fails with a one-line diagnosis naming the table,
  * the missing/unexpected columns, or the unaccepted encoding — BEFORE any
  * query runs.
  *
  * Column TYPES are deliberately only pinned where the repo branches on
  * them (`events.ts`): pinning every type would turn benign widenings
  * (int32→int64) into false alarms, while missing/renamed columns and the
  * one encoding we adapt to are exactly the drifts that break queries.
  */
object TablesContract {
  /** Expected column set per table (names only; order-insensitive). */
  val expectedColumns: Map[String, Set[String]] = Map(
    "region"     -> Set("r_regionkey", "r_name"),
    "nation"     -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                        "l_linestatus", "l_shipdate"),
    "events"     -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  /** Encodings [[Tables.events]] knows how to normalize. */
  val acceptedEventsTs: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)

  /** Row-count census of the driver testdata as of round 9 (BASELINE.md
    * records the same table with file md5s). Round 7's regeneration kept
    * counts but changed `documents` CONTENT — the simhash/span bench
    * deltas were the only tell; this census makes count drift mechanical.
    * Used by [[rowDrift]], which WARNS instead of throwing: a count change
    * alone breaks no query (the DuckDB oracle replays the same files), so
    * failing the whole Verify run over it would turn a benign regen into
    * a zeroed round. The loud lane is TablesContractSpec's assertion. */
  val expectedRows: Map[String, Map[String, Long]] = Map(
    "sf0.001" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L, "documents" -> 500L,
      "embeddings" -> 500L),
    "sf0.01" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 1500L,
      "supplier" -> 100L, "part" -> 2000L, "orders" -> 15000L,
      "lineitem" -> 60000L, "events" -> 10000L, "documents" -> 500L,
      "embeddings" -> 500L),
    "sf0.1" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 15000L,
      "supplier" -> 1000L, "part" -> 20000L, "orders" -> 150000L,
      "lineitem" -> 600000L, "events" -> 100000L, "documents" -> 5000L,
      "embeddings" -> 2000L))

  /** Non-throwing row-count drift report: one line per table whose count
    * differs from [[expectedRows]], empty when everything matches or the
    * sf dir isn't in the census. Verify prints these to stderr so a
    * regenerated corpus is visible in the round log. */
  def rowDrift(spark: SparkSession, sfDir: String): Seq[String] = {
    val sfName = sfDir.split('/').lastOption.getOrElse(sfDir)
    expectedRows.get(sfName).toSeq.flatMap { expected =>
      expected.toSeq.sorted.flatMap { case (table, want) =>
        val got = Tables.load(spark, sfDir, table).count()
        if (got == want) None
        else Some(s"$table rows drifted: $want (r9 census) -> $got — testdata " +
          "regenerated; update TablesContract.expectedRows + BASELINE.md census")
      }
    }
  }

  /** Throws IllegalStateException on first contract violation; returns the
    * per-table column counts on success (useful as a smoke signal). */
  def check(spark: SparkSession, sfDir: String): Map[String, Int] =
    expectedColumns.map { case (table, expected) =>
      val schema =
        try Tables.load(spark, sfDir, table).schema
        catch { case e: Exception =>
          throw new IllegalStateException(
            s"testdata contract: cannot read $sfDir/$table.parquet: ${e.getMessage}", e)
        }
      val found = schema.fieldNames.toSet
      val missing = expected -- found
      val extra   = found -- expected
      if (missing.nonEmpty || extra.nonEmpty)
        throw new IllegalStateException(
          s"testdata contract: $table schema drifted — missing=${missing.toSeq.sorted.mkString(",")} " +
            s"unexpected=${extra.toSeq.sorted.mkString(",")} (found: ${schema.simpleString})")
      if (table == "events") {
        val tsType = schema("ts").dataType
        if (!acceptedEventsTs.contains(tsType))
          throw new IllegalStateException(
            s"testdata contract: events.ts encoding $tsType not in accepted set " +
              s"{bigint(nanos), timestamp, timestamp_ntz} (found: ${schema.simpleString})")
      }
      table -> found.size
    }
}
