package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G17 — referential-integrity census: orphan foreign keys per
  * child→parent edge — GE 0.18's
  * `expect_column_values_to_exist_in_other_table` vocabulary (the
  * multi-table expectation the single-table G-series can't express),
  * and the check every star schema needs nightly: a broken upstream
  * join silently drops or duplicates fact rows long before a row-count
  * check notices.
  *
  * Per edge, ONE left-anti join of the child's non-null fk values
  * against the parent's key set, co-partitioned on the key (the parent
  * side prunes to its pk column and deduplicates — at any scale the
  * anti join carries keys only, never rows); null fks are counted
  * separately, not as orphans (SQL FK semantics: a null reference is
  * MISSING, not DANGLING — D4's ternary-logic discipline). The edge
  * censuses union into one small verdict frame.
  */
object Referential {

  /** One row: (child_table, fk_column, parent_table, n_child,
    * n_null_fk, n_orphans, passed) — ONE left join against the
    * deduplicated key set (no fan-out possible) + ONE aggregate, so
    * all three counters ride a single pass. */
  def orphanCensus(child: DataFrame, childName: String, fkCol: String,
                   parent: DataFrame, parentName: String,
                   pkCol: String): DataFrame = {
    val keys = parent.select(col(pkCol).as("__pk")).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(fkCol).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left_outer")
      .agg(
        count(when(col("__fk").isNotNull, lit(1))).as("n_child"),
        count(when(col("__fk").isNull, lit(1))).as("n_null_fk"),
        count(when(col("__fk").isNotNull && col("__hit").isNull, lit(1)))
          .as("n_orphans"))
      .select(
        lit(childName).as("child_table"), lit(fkCol).as("fk_column"),
        lit(parentName).as("parent_table"),
        col("n_child"), col("n_null_fk"), col("n_orphans"),
        (col("n_orphans") === 0L).as("passed"))
  }

  /** G18 — functional-dependency census: does `detCol` DETERMINE
    * `depCol` (every determinant value maps to at most one dependent
    * value)? The DQ class behind "each nation belongs to exactly one
    * region", "each SKU has one unit price" — a broken upstream join
    * or a double-loaded dimension violates the FD long before totals
    * drift. ONE partial-agg census per determinant (map-side combined;
    * never a window); NULL dependents count as MISSING, not as a
    * value (the [[orphanCensus]] null discipline) — a determinant with
    * {null, 'A'} still holds the FD. */
  def fdCensus(df: DataFrame, detCol: String, depCol: String): DataFrame =
    df.groupBy(col(detCol))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(depCol)).as("n_dep_values"))
      .withColumn("fd_holds", col("n_dep_values") <= 1)
      .orderBy(detCol)

  /** G21 — cross-table row-count parity: GE 0.18's
    * `expect_table_row_count_to_equal_other_table`, the two-table
    * expectation a staging contract runs nightly ("the staged model
    * must carry exactly its source's rows" — the reference does this
    * by hand with paired count queries, pager-workflow.py:126 vs
    * :159). ONE count aggregate per side; the two one-row tallies
    * union and fold in a final one-row aggregate — no join of any
    * kind (a one-row×one-row join would plan as the BNLJ the plan
    * audit bans), so the whole check is two scans + O(1) rows moved
    * at any scale. */
  def rowCountParity(a: DataFrame, aName: String,
                     b: DataFrame, bName: String): DataFrame = {
    val ca = a.agg(count(lit(1)).as("n"))
      .select(lit("a").as("__side"), col("n"))
    val cb = b.agg(count(lit(1)).as("n"))
      .select(lit("b").as("__side"), col("n"))
    ca.unionByName(cb)
      .agg(max(when(col("__side") === "a", col("n"))).as("n_a"),
        max(when(col("__side") === "b", col("n"))).as("n_b"))
      .select(lit(aName).as("table_a"), lit(bName).as("table_b"),
        col("n_a"), col("n_b"), (col("n_a") === col("n_b")).as("passed"))
  }

  /** The Benford first-digit expectations in ppm —
    * round(10⁶·log₁₀(1 + 1/d)). LITERALS (one table, mirrored
    * verbatim in the oracle) rather than computed: a log10 computed
    * independently per engine would reintroduce the libm exposure the
    * micro-nat lanes audit for, over constants that never change. */
  val BenfordPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** G19 — Benford first-digit screen: naturally-occurring positive
    * measures follow Benford's law; fabricated or truncated data does
    * not — the classic fraud/DQ screen for amount columns. The first
    * SIGNIFICANT digit comes from the 4-dp scaled long's decimal
    * rendering (`substring(cast(scaled), 1, 1)` — bigint-to-string is
    * exponent-free and identical in both engines; float `log10`
    * binning would wobble at power-of-ten boundaries). Zero/negative
    * values are excluded (Benford is defined on positive magnitudes);
    * output per digit: observed count, observed ppm (floor), the
    * Benford expectation, and the absolute deviation. ONE partial-agg
    * census — 9 rows out at any corpus size. */
  def benford(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val expectation = BenfordPpm.toSeq.sortBy(_._1)
      .foldRight(lit(null).cast("long"): org.apache.spark.sql.Column) {
        case ((d, ppm), acc) =>
          when(col("digit") === d.toString, lit(ppm)).otherwise(acc)
      }
    df.select((col(valueCol).cast("decimal(18,4)") * lit(10000))
        .cast("long").as("__sc"))
      .filter(col("__sc") > 0L)
      .select(substring(col("__sc").cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .withColumn("__total", sum(col("n_obs"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
      .withColumn("obs_ppm", expr("(n_obs * 1000000) div __total"))
      .withColumn("benford_ppm", expectation)
      .withColumn("abs_dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .drop("__total")
      .orderBy("digit")
  }

  /** Census over a list of edges: (child df, child name, fk, parent
    * df, parent name, pk). */
  def census(edges: Seq[(DataFrame, String, String, DataFrame, String,
      String)]): DataFrame = {
    require(edges.nonEmpty, "at least one edge required")
    edges.map { case (c, cn, fk, p, pn, pk) =>
      orphanCensus(c, cn, fk, p, pn, pk)
    }.reduce(_.unionByName(_))
  }
}
