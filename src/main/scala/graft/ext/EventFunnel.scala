package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X37 — ordered-step funnel conversion over the event stream: how
  * many users performed step 1, then step 2 STRICTLY AFTER their first
  * step 1, then step 3 strictly after that — the product-analytics
  * dual of [[Retention]] (retention asks "did they come back", the
  * funnel asks "did they get through").
  *
  * Semantics, precisely: a user converts step i+1 at the EARLIEST
  * event of that type strictly after their step-i conversion time
  * (the standard unordered-funnel reading; the earliest-first greedy
  * choice maximizes downstream conversions, so it is also the
  * canonical one). Ties on the exact timestamp do NOT convert —
  * strict `>` on both engines.
  *
  * Plan shape: stage i is one filtered user-keyed partial aggregate
  * joined co-partitioned to stage i−1 (the user key never changes, so
  * AQE reuses the partitioning; no corpus window, no per-user event
  * array materialization). The k-step funnel costs k filtered scans —
  * at 100 TB with event-type partition/row-group pruning each scan
  * touches only its step's slice. */
object EventFunnel {

  /** `(step_idx, step, n_users, conv_ppm)` — conv_ppm is integer ppm
    * vs the step-1 population (floor division; step 1 = 10⁶). */
  def funnel(events: DataFrame, steps: Seq[String],
             tsCol: String = "ts", userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    // Stage frames: (user, __t = conversion time of this step).
    val stages = steps.tail.scanLeft(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))) {
      (prev, step) =>
        events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol).as("__ts"))
          .join(prev.select(col(userCol), col("__t").as("__tp")), userCol)
          .filter(col("__ts") > col("__tp"))
          .groupBy(col(userCol)).agg(min(col("__ts")).as("__t"))
    }
    val counts = steps.zip(stages).zipWithIndex.map {
      case ((step, frame), i) =>
        frame.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("step_idx"), lit(step).as("step"),
            col("n_users"))
    }.reduce(_ unionByName _)
    val first = counts.filter(col("step_idx") === 1L)
      .select(col("n_users").as("__n1"))
    counts.crossJoin(broadcast(first))
      .select(col("step_idx"), col("step"), col("n_users"),
        expr("(n_users * 1000000) div __n1").as("conv_ppm"))
      .orderBy("step_idx")
  }
}
