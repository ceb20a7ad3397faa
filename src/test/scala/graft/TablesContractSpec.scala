package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Canary: the driver-regenerated testdata must match the column contract
  * the queries assume, and `events.ts` must arrive in an encoding
  * [[Tables.events]] can normalize. A drift here fails with one named
  * diagnosis instead of N downstream analysis errors (the round-7 mode). */
class TablesContractSpec extends SparkSpec {

  test("all ten tables at sf0.001 satisfy the contract") {
    val counts = TablesContract.check(spark, sfDir)
    assert(counts.keySet == TablesContract.expectedColumns.keySet)
  }

  test("events loader normalizes ts to TimestampType regardless of encoding") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    // and it analyzes + executes (the regression was an analysis failure)
    assert(ev.agg(count(lit(1))).first().getLong(0) > 0L)
  }

  test("a drifted table fails with a diagnosis naming the table") {
    val tmp = java.nio.file.Files.createTempDirectory("contract").toString
    // Write a plausible-but-renamed events table; leave other tables absent.
    spark.range(3).select(
      col("id").as("event_id"),
      current_timestamp().as("event_ts"), // renamed: was `ts`
      col("id").as("user_id"),
      lit("click").cast(StringType).as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException](TablesContract.check(spark, tmp))
    // Message names a table and says what drifted (missing file or column).
    assert(e.getMessage.contains("testdata contract"))
  }
}
