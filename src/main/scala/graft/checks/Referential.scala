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
