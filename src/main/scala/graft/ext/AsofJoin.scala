package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X21 — AS-OF join: attach to each left row the right row with the
  * same key and the greatest right-time at-or-before the left row's
  * time — the temporal-alignment primitive (feature lookups "as of"
  * an event, point-in-time-correct joins for training data) that
  * Spark's Dataset API lacks (pandas-on-Spark has merge_asof; SQL
  * engines grew ASOF JOIN — DuckDB's is the oracle here).
  *
  * Spark-first implementation — NOT a range-join explosion: union the
  * two sides with a side marker, ONE shuffle on the key, and a
  * within-partition sort by (time, marker); `last(_, ignoreNulls)`
  * over the running window carries the most recent right-side values
  * onto each left row. Cost = one shuffle + one sort of |L| + |R|,
  * the same order as a groupBy over the union — no per-row range
  * probe, no cartesian corner. At equal times the right row sorts
  * FIRST (marker 0 < 1), so "at-or-before" includes the simultaneous
  * row, matching ASOF's `left.t >= right.t` convention.
  *
  * Determinism contract: the right side must be unique per
  * (key, time) — callers pick the winner explicitly (e.g. max-id via
  * [[dedupRight]]) instead of inheriting engine-dependent tie luck.
  * Left rows with no eligible right row keep null right columns
  * (LEFT ASOF semantics).
  */
object AsofJoin {

  /** Deterministic right-side dedup: one row per (key, time), keeping
    * the row with the greatest `tieCol` — partial-agg `max_by`, the
    * same min/max-by discipline as exact dedup (no window sort). */
  def dedupRight(right: DataFrame, keyCol: String, timeCol: String,
                 tieCol: String): DataFrame = {
    val cols = right.columns
    right.groupBy(col(keyCol), col(timeCol))
      .agg(max_by(struct(cols.toIndexedSeq.map(col): _*), col(tieCol)).as("__r"))
      .select(cols.toIndexedSeq.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** The as-of join. `rightCols` are emitted as `prefix + name`;
    * the left frame's columns pass through unchanged. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, leftTime: String, rightTime: String,
               rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    val leftCols = left.columns.toIndexedSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // NULL key/time right rows can never match under SQL ASOF semantics
    // (`l.key = r.key AND l.t >= r.t` is never true on NULL), but
    // Window.partitionBy groups NULL keys and sorts NULL times first —
    // left NULL-key rows would silently carry them. Drop them here so
    // the window replay pins LEFT-ASOF SQL semantics exactly; left rows
    // with NULL key/time still pass through with null right columns
    // (their partition holds no __side=0 row / the carry starts null).
    val r0 = right
      .filter(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .select(
        (Seq(col(keyCol), col(rightTime).as("__t"), lit(0).as("__side")) ++
          rightCols.map(c => col(c).as(s"__r_$c"))).toIndexedSeq: _*)
    // Align schemas: left gains null right-value columns, right gains
    // null left columns (unionByName fills by name).
    val lAligned = rightCols.foldLeft(l) { (d, c) =>
      d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rAligned = leftCols.filterNot(_ == keyCol).foldLeft(r0) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lAligned.unionByName(rAligned)
    // ONE keyed shuffle + sort; the running last(ignoreNulls) is the
    // as-of carry. Equal times: right (__side 0) precedes left. The
    // carry is ONE struct — per-column carries would skip a chosen
    // row's legitimately-NULL field back to an older non-null value,
    // silently mixing two right rows.
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rStruct = when(col("__side") === 0,
      struct(rightCols.map(c => col(s"__r_$c").as(c)).toIndexedSeq: _*))
    val carried = unioned
      .withColumn("__rrow", last(rStruct, ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col(s"__rrow.$c").as(s"$prefix$c"))).toIndexedSeq: _*)
  }

  /** X42 — point-in-time dimension enrichment: join each fact row to
    * the dimension VERSION valid at its timestamp (`valid_from <= t`,
    * and `t < valid_to` when a `valid_to` is set) — the consumer of
    * T4/s7's SCD-2 history, and the join every "what tier was this
    * user ON THAT DAY" report needs (joining the current slice instead
    * silently rewrites history — the classic leakage bug).
    *
    * SCD-2 validity intervals are non-overlapping per key, so the
    * at-or-before [[asofJoin]] on `valid_from` finds the only
    * candidate in ONE keyed shuffle+sort (never an interval explosion
    * or a BETWEEN nested loop); a candidate whose `valid_to` has
    * already passed marks a HISTORY GAP and enriches as NULL (checked
    * post-carry — `attrs` come back null, exactly like a key with no
    * version at all). Facts before a key's first version, unknown
    * keys, and null keys/times all enrich as NULL through the asof
    * machinery's existing semantics. */
  def enrichAsOf(facts: DataFrame, dim: DataFrame, keyCol: String,
                 timeCol: String, attrs: Seq[String],
                 validFrom: String = "valid_from",
                 validTo: String = "valid_to",
                 prefix: String = "dim_"): DataFrame = {
    require(attrs.nonEmpty, "attrs must name at least one dimension column")
    val j = asofJoin(facts, dim, keyCol, timeCol, validFrom,
      rightCols = (attrs :+ validTo :+ validFrom).distinct, prefix = "__e_")
    val expired = col(s"__e_$validTo").isNotNull &&
      col(timeCol) >= col(s"__e_$validTo")
    val enriched = (attrs :+ validFrom).distinct.foldLeft(j) { (d, c) =>
      d.withColumn(s"$prefix$c", when(!expired, col(s"__e_$c")))
    }
    enriched.drop(
      (attrs :+ validTo :+ validFrom).distinct.map(c => s"__e_$c"): _*)
  }
}
