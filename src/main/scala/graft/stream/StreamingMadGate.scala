package graft.stream

import org.apache.spark.sql.DataFrame

import graft.ext.RobustStats

/** S16 — STREAMING robust anomaly gate: the X44 median/MAD screen in
  * its fit-once/serve-streaming form (the s9 percentile-cut shape
  * applied to measures): the cuts fit ONCE on the trusted history
  * ([[RobustStats.fit]] — a dim-sized (group, med2, mad2) frame), and
  * each arriving measurement gates through one broadcast join + one
  * all-integer comparison — no state store, no watermark, no
  * aggregation on the stream. Rows from groups the fit never saw gate
  * NULL (fail-safe — route to a refit, never silently clean).
  *
  * Annotate-don't-drop; micro-batch ≡ batch pinned in
  * StreamingMadGateSpec; the registered lane is the batch replay
  * against a full SQL oracle that re-derives the cuts from the fit
  * half from scratch. */
object StreamingMadGate {

  def gateStream(stream: DataFrame, cuts: DataFrame,
                 valueCol: String = "value",
                 groupCol: String = "event_type",
                 k: Long = 3L): DataFrame =
    RobustStats.gateAgainst(stream, cuts, valueCol, groupCol, k)
}
