package graft

import org.apache.spark.sql.SparkSession

/** One place to build correctly-configured local sessions for the engine's
  * mains (Verify/Bench/EntrySmoke) and tests, so per-table loaders stay
  * side-effect free (no hidden session-conf mutation in the data path).
  */
object Sessions {

  /** Session confs the engine requires:
    *  - UTC so ISO-8601 timestamp semantics match the oracle;
    *  - `nanosAsLong`: events.parquet carries TIMESTAMP(NANOS), which the
    *    vectorized reader rejects without it (nanos surface as long and
    *    [[Tables.events]] floor-divides to micros);
    *  - shuffle partitions sized to the core count, not the 200 default —
    *    at 100 TB this becomes a per-job AQE-advised setting instead;
    *  - parquet aggregate pushdown (off by default upstream): unfiltered
    *    COUNT/MIN/MAX answer from row-group footer statistics instead of
    *    scanning data — the D1/G1 row-count vocabulary on a 100 TB table
    *    becomes a metadata read (measured ~6× at sf0.1 locally).
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Aggregate pushdown only exists on the DataSource V2 read path;
      // parquet defaults to V1 via useV1SourceList. All other pushdowns
      // (filters, pruning) are equivalent on V2.
      .config("spark.sql.sources.useV1SourceList", "")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
