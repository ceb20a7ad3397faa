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
