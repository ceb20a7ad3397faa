package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X6b — exact top-N per group without a skewed global window: "keep
  * the best N documents per language/source by score", the curation
  * primitive behind best-of selection, per-stratum capping, and
  * shortlist building.
  *
  * The naive plan — `row_number() OVER (PARTITION BY group ORDER BY
  * score DESC)` — shuffles EVERY row of a group to one reducer and
  * sorts it there. At 100 TB with an 80%-of-corpus `en` stratum that
  * is a single task sorting 80 TB: the exact shape the terminal-writer
  * sharding fix killed, reborn in selection.
  *
  * Two-stage exact plan instead:
  *
  *  1. per-(group, input-partition) top-N — a window over the
  *     composite key, so each sort unit is ~1/P of any group
  *     regardless of skew. CORRECTNESS: a true global top-N row has
  *     fewer than N rows ranked above it globally, hence fewer than N
  *     above it inside its own partition, hence partition-rank ≤ N —
  *     stage 1 provably retains every true top-N row for ANY
  *     partitioning of the input (property-tested across
  *     repartitionings);
  *  2. global top-N over the survivors — the per-group window now
  *     sees at most N·P candidate rows (P = input partitions), a
  *     bounded frame no matter how large or skewed the group is.
  *
  * Determinism: the ordering (score DESC, key ASC) is a TOTAL order
  * (the key is unique), so ties cannot make the result depend on
  * partitioning or engine — the DuckDB oracle replays the selection
  * with a plain window over the same total order.
  *
  * Output = the input rows of the winners plus their 1-based
  * `rank_in_group` (`rk_`-prefixed column discipline). */
object TopK {

  def topNPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   n: Int, keyCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    val order = Seq(col(scoreCol).desc, col(keyCol).asc)
    val stage1 = Window.partitionBy(col(groupCol), col("__tk_pid"))
      .orderBy(order: _*)
    val stage2 = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("__tk_pid", spark_partition_id())
      .withColumn("__tk_r1", row_number().over(stage1))
      .filter(col("__tk_r1") <= n)
      .withColumn("rank_in_group", row_number().over(stage2))
      .filter(col("rank_in_group") <= n)
      .drop("__tk_pid", "__tk_r1")
  }
}
