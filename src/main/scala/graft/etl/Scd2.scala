package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T4 — slowly-changing-dimension type-2 snapshot merge: the dbt
  * `snapshot` (check strategy) semantics the reference's dbt layer
  * implies but never materializes (its models are views over current
  * state — `/root/reference/airflow/dags/pager-workflow.py:292-306`
  * runs `dbt run` with no snapshot blocks). Dimension history is table
  * stakes for a warehouse the platform validates: every mart join
  * against a mutating dimension silently rewrites history without it.
  *
  * Contract (dbt check-strategy, hard deletes ignored):
  *  - history carries `valid_from`, `valid_to` (null = open),
  *    `is_current`; closed rows pass through UNTOUCHED;
  *  - an open row whose key is absent from the update snapshot stays
  *    open (the source did not report it — not evidence of change);
  *  - an open row whose tracked columns all match (null-safely) stays
  *    open;
  *  - an open row with any tracked column changed CLOSES
  *    (`valid_to = ts`, `is_current = false`) and the update row
  *    inserts as the new open version (`valid_from = ts`);
  *  - a key new to the dimension inserts as an open row.
  *
  * Scale shape: ONE full-outer join shuffled on the business key — the
  * open slice and the snapshot co-partition, closed history never
  * shuffles (union pass-through). Change emission is branch-free on
  * the joined row: each side builds its output struct, a 2-element
  * `explode(array(...))` fans the changed case into close+insert in
  * the same codegen stage — no second pass over the join, nothing
  * cached, no window. Null-safe (`<=>`) key and change comparison so
  * null tracked values neither always-change nor never-change.
  */
object Scd2 {

  /** `history` columns: keys ++ tracked ++ (valid_from, valid_to,
    * is_current); `updates` columns: keys ++ tracked (extra columns
    * ignored). `ts` must be the valid_from/valid_to type (date or
    * timestamp). Output schema = history's, same column order.
    *
    * PRECONDITIONS (ADVICE r10): `keys` and `tracked` must be
    * non-empty (the change test is a reduce over `tracked`; an empty
    * list is a contract error, caught loudly here, not an empty
    * reduce). Business keys must be UNIQUE in `updates` and in the
    * open history slice — dbt snapshots hard-error on duplicate keys;
    * this operator does not scan for them (a distributed uniqueness
    * check would cost a full shuffle per merge — run it as a G7/G8
    * unique check upstream where the suite already owns that pass),
    * and duplicate keys on either side fan out the full-outer join,
    * emitting duplicate close/insert versions. */
  def snapshot(history: DataFrame, updates: DataFrame,
               keys: Seq[String], tracked: Seq[String],
               ts: Column): DataFrame = {
    require(keys.nonEmpty, "SCD-2 snapshot requires at least one key column")
    require(tracked.nonEmpty,
      "SCD-2 snapshot requires at least one tracked column")
    val outCols = keys ++ tracked ++ Seq("valid_from", "valid_to", "is_current")
    val closed = history.filter(!col("is_current"))
      .select(outCols.map(col): _*)
    val open = history.filter(col("is_current"))
      .select((keys ++ tracked :+ "valid_from").map(col): _*)
      .withColumn("__h", lit(true))
    val upd = updates
      .select((keys ++ tracked).map(col): _*)
      .toDF((keys ++ tracked).map("u_" + _): _*)
      .withColumn("__u", lit(true))

    val j = open.join(upd,
      keys.map(k => col(k) <=> col(s"u_$k")).reduce(_ && _), "full_outer")
    val hEx = col("__h").isNotNull
    val uEx = col("__u").isNotNull
    val changed = hEx && uEx &&
      tracked.map(c => !(col(c) <=> col(s"u_$c"))).reduce(_ || _)

    // Carried-or-closed version of the existing open row (absent keys
    // and unchanged rows stay open; changed rows close at ts) …
    val fromOpen = struct(
      (keys.map(col) ++ tracked.map(col)
        :+ col("valid_from")
        :+ when(changed, ts).otherwise(lit(null)).cast(
             history.schema("valid_to").dataType).as("valid_to")
        :+ (!changed).as("is_current")): _*)
    // … and the new open version from the snapshot (changed or brand-new).
    val fromUpd = struct(
      (keys.map(k => col(s"u_$k").as(k)) ++ tracked.map(c => col(s"u_$c").as(c))
        :+ ts.as("valid_from")
        :+ lit(null).cast(history.schema("valid_to").dataType).as("valid_to")
        :+ lit(true).as("is_current")): _*)

    val emitted = j
      .select(explode(array(
        when(hEx, fromOpen),
        when(uEx && (changed || !hEx), fromUpd))).as("r"))
      .filter(col("r").isNotNull)
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)

    closed.unionByName(emitted)
  }
}
