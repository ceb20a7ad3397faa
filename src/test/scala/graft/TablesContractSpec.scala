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

  test("row counts at every scale factor match the r9 census") {
    // The LOUD lane for testdata regeneration (Verify itself only warns —
    // count drift breaks no oracle compare). If this fails the driver
    // regenerated the corpus: update TablesContract.expectedRows and the
    // BASELINE.md census, and treat cross-round bench deltas on
    // text-derived queries (simhash, span dedup) as corpus shift.
    for (sf <- TablesContract.expectedRows.keys.toSeq.sorted) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        val drift = TablesContract.rowDrift(spark, dir)
        assert(drift.isEmpty, s"$sf: ${drift.mkString("; ")}")
      }
    }
  }

  test("rowDrift reports a drifted count with the table named") {
    val tmp = java.nio.file.Files.createTempDirectory("rowdrift").toString +
      "/sf0.001"
    // A fake sf0.001 with the wrong region row count (and only region —
    // rowDrift must report the first table it checks without needing
    // the rest; alphabetically 'customer' comes first, so copy the rest).
    for (t <- TablesContract.expectedRows("sf0.001").keys)
      Tables.load(spark, sfDir, t).limit(if (t == "region") 3 else 100000)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    val drift = TablesContract.rowDrift(spark, tmp)
    assert(drift.exists(_.startsWith("region rows drifted")), drift.mkString("; "))
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
