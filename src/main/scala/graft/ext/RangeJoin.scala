package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X22 — range (interval) join: match each left row to every right
  * interval of the same key containing its time — the second temporal
  * primitive the Dataset API lacks (a naive non-equi join degenerates
  * to a per-key cartesian with a post-filter; Spark plans it as
  * BroadcastNestedLoopJoin the moment the key alone is the equi part).
  *
  * Spark-first shape: BUCKETIZE time. Each right interval explodes to
  * the fixed-width bins it covers, the left row computes its single
  * bin, and the join becomes a plain hash equi-join on (key, bin) with
  * the exact `BETWEEN` as a residual filter. Cost = |L| + Σ
  * interval-span/bin replicated right rows through ONE shuffle — no
  * nested loop, no cartesian corner; `binSeconds` trades right-side
  * replication (long intervals → more bins) against candidate
  * precision (wide bins → more residual-filtered candidates). Pick it
  * near the median interval length.
  *
  * Semantics: inclusive on both endpoints (`BETWEEN`), overlapping
  * intervals yield one output row per containing interval, and rows
  * with no containing interval drop (inner). All matching is on exact
  * integer seconds (`unix_timestamp` floors identically in both
  * engines), so the DuckDB oracle replays it as a plain BETWEEN join.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                leftTime: String, rightStart: String, rightEnd: String,
                binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, s"binSeconds ($binSeconds) must be positive")
    val lb = left.withColumn("__bin",
      floor(unix_timestamp(col(leftTime)) / lit(binSeconds)).cast("long"))
    // An inverted interval (end < start) matches nothing under BETWEEN,
    // but sequence(start, stop) THROWS on a descending range — one
    // malformed right row must drop, not crash the job. Filter before
    // the explode (same integer-second comparison the residual uses).
    val rb = right
      .filter(unix_timestamp(col(rightStart)) <= unix_timestamp(col(rightEnd)))
      .withColumn("__bin",
        explode(sequence(
          floor(unix_timestamp(col(rightStart)) / lit(binSeconds)).cast("long"),
          floor(unix_timestamp(col(rightEnd)) / lit(binSeconds)).cast("long"))))
    lb.join(rb, Seq(keyCol, "__bin"))
      .filter(col(leftTime) >= col(rightStart) &&
        col(leftTime) <= col(rightEnd))
      .drop("__bin")
  }
}
