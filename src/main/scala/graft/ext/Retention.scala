package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X36 — cohort retention over the event stream: users grouped by
  * FIRST-ACTIVE day, and for each (cohort day, day offset) the count
  * of cohort members active at that offset — the classic product /
  * data-quality analytics matrix ("is the day-7 retention of last
  * week's signups collapsing?" is a drift check as much as a product
  * metric).
  *
  * Plan shape at scale: ONE distinct shuffle to the (user, day)
  * activity set (map-side combined — raw events collapse to at most
  * users×days rows before the network), a user-keyed partial
  * aggregate for cohorts, a join that co-partitions on the SAME user
  * key (no third shuffle of the activity set), and a final census
  * that is |cohorts|×|offsets|-sized — never a corpus-wide window.
  * The retention rate is integer ppm (floor(n·10⁶/size)), so the
  * whole matrix replays exactly in SQL. */
object Retention {

  /** `(cohort_day, day_offset, n_active, cohort_size, retained_ppm)`
    * ordered by (cohort_day, day_offset). Offset 0 rows carry
    * `n_active = cohort_size` by construction. */
  def cohortRetention(events: DataFrame, tsCol: String = "ts",
                      userCol: String = "user_id"): DataFrame = {
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val cohorts = activity.groupBy(col(userCol))
      .agg(min(col("__day")).as("__cohort"))
    val sizes = cohorts.groupBy(col("__cohort").as("__cg"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, userCol)
      .groupBy(col("__cohort"),
        datediff(col("__day"), col("__cohort")).cast("long").as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_active"))
      .join(broadcast(sizes), col("__cohort") === col("__cg"))
      .select(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_active"), col("cohort_size"),
        // Integer div (Spark's `/` on longs returns double): exact at
        // any scale, and DuckDB's `//` floors identically on
        // positives.
        expr("(n_active * 1000000) div cohort_size").as("retained_ppm"))
      .orderBy("cohort_day", "day_offset")
  }
}
