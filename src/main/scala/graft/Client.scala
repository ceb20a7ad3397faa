package graft

import org.apache.spark.sql.DataFrame

/** D5 — small-result materialization to the client, as an explicit,
  * guarded operator (the reference's `.to_dataframe().iloc[0]['count']`
  * scalar fetch and `['col'].tolist()` column fetch —
  * pager-workflow.py:126,218,221).
  *
  * The guards are the 100 TB discipline: a driver fetch is only legal on
  * results that are PROVABLY small — a one-row verdict or a bounded
  * sample. Fetching an unbounded DataFrame throws instead of quietly
  * OOM-ing the driver.
  */
object Client {

  final class UnboundedFetchException(msg: String) extends RuntimeException(msg)

  /** The reference's `.iloc[0]['col']`: exactly-one-row scalar fetch.
    * Throws if the result has 0 or ≥2 rows. */
  def fetchScalar[T](df: DataFrame, column: String): T = {
    val rows = df.select(column).limit(2).collect()
    if (rows.length != 1)
      throw new UnboundedFetchException(
        s"fetchScalar expects exactly one row, got ${if (rows.length < 1) 0 else "≥2"}")
    rows(0).getAs[T](0)
  }

  /** The reference's `['col'].tolist()`: bounded column fetch. Throws if
    * the result exceeds `maxRows` — the caller must aggregate, distinct,
    * or limit first. */
  def fetchColumn[T](df: DataFrame, column: String, maxRows: Int = 10000): Seq[T] = {
    require(maxRows >= 0 && maxRows < Int.MaxValue,
      s"maxRows must be in [0, ${Int.MaxValue - 1}]") // maxRows+1 below must not overflow
    val rows = df.select(column).limit(maxRows + 1).collect()
    if (rows.length > maxRows)
      throw new UnboundedFetchException(
        s"fetchColumn result exceeds $maxRows rows — aggregate or limit before fetching")
    rows.toSeq.map(_.getAs[T](0))
  }
}
