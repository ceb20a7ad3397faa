package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.8 — streaming sessionization: the [[graft.ext.Sessionize]]
  * semantics over a live event stream, implemented with
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the custom-state
  * primitive (windows/dropDuplicates cannot express "a session ends
  * when the USER goes quiet", because the window end depends on the
  * data, not the clock grid).
  *
  * State design (the part that must hold at 100 TB/day):
  *  - per-user state is ONE open session — five longs (session index,
  *    start/last micros, count, decimal-scaled value sum), never the
  *    events themselves;
  *  - sessions CLOSE two ways: a new event with gap > threshold closes
  *    the previous session inline, and an `EventTimeTimeout` set at
  *    `last + gap` closes the final session once the WATERMARK passes
  *    it — so emission is append-mode and exactly-once per session;
  *  - after a timeout emit, the state row stays behind (open = none)
  *    to preserve the user's session-index continuity; residual state
  *    is O(distinct users), the same bound as any per-user counter.
  *
  * Ordering: events are sorted (ts, event_id) WITHIN each micro-batch;
  * a cross-batch late event (within the watermark) folds into the open
  * session via min/max bounds rather than splitting it — the practical
  * streaming simplification, documented here because a sufficiently
  * late event that SHOULD have opened its own session will instead
  * extend the open one. The batch replay sees all data sorted, where
  * the fold is exactly [[graft.ext.Sessionize.summary]]'s
  * gaps-and-islands definition (same oracle, pinned by spec).
  *
  * Value sums ride the engine-exact decimal quantum: each value is
  * cast to DECIMAL(18,4) and carried as a scaled long, so the
  * streaming, batch, window, and SQL formulations cannot drift by a
  * float ulp.
  */
object StreamingSessionize {

  /** Projected event: (user, event-time micros, tiebreak id,
    * decimal(18,4)-scaled value). `ts` duplicates `us` as the original
    * timestamp ONLY because the watermark rides column metadata: the
    * stateful operator requires a watermarked event-time column in its
    * child, and `unix_micros(ts)` strips it. The fold reads `us`. */
  private[stream] final case class Ev(
      user: Option[Long], us: Long, eid: Long, vs: Long,
      ts: java.sql.Timestamp)

  /** Per-user state: current open session, or `n == 0` for "none"
    * (kept alive for index continuity after a timeout emit). */
  private[stream] final case class SessState(
      idx: Long, startUs: Long, lastUs: Long, n: Long, vsSum: Long)

  /** An emitted (closed) session, micros-typed; the public frame
    * derives timestamps/duration/value from these exact integers. */
  private[stream] final case class SessOut(
      user_id: Option[Long], session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long, vs_sum: Long)

  private def floorSec(us: Long): Long = Math.floorDiv(us, 1000000L)

  /** Fold a SORTED event run onto an optional open session; returns
    * (closed sessions, open tail). `baseIdx` numbers the first NEW
    * session when no session is open (0 for a fresh user; the last
    * emitted index after a timeout — index continuity lives here).
    * Shared verbatim by the batch and streaming paths — the gap rule
    * lives once. */
  private def fold(user: Option[Long], events: Iterator[Ev],
                   gapSeconds: Long, prior: Option[SessState],
                   baseIdx: Long): (Seq[SessOut], Option[SessState]) = {
    val sorted = events.toArray.sortBy(e => (e.us, e.eid))
    var open = prior
    val out = Seq.newBuilder[SessOut]
    def close(s: SessState): Unit =
      out += SessOut(user, s.idx, s.n, s.startUs, s.lastUs, s.vsSum)
    sorted.foreach { e =>
      open = open match {
        case Some(s) if floorSec(e.us) - floorSec(s.lastUs) <= gapSeconds =>
          // Late (within-watermark) events extend via min/max bounds.
          Some(SessState(s.idx, math.min(s.startUs, e.us),
            math.max(s.lastUs, e.us), s.n + 1, s.vsSum + e.vs))
        case Some(s) =>
          close(s)
          Some(SessState(s.idx + 1, e.us, e.us, 1L, e.vs))
        case None =>
          Some(SessState(baseIdx + 1L, e.us, e.us, 1L, e.vs))
      }
    }
    (out.result(), open)
  }

  /** The typed event projection — `unix_micros` + the DECIMAL(18,4)
    * scaled-long value quantum. */
  private def project(events: DataFrame, userCol: String, tsCol: String,
                      tieCol: String, valueCol: String): Dataset[Ev] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(
        col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("eid"),
        (col(valueCol).cast("decimal(18,4)") * lit(10000)).cast("long").as("vs"),
        col(tsCol).as("ts"))
      .as[Ev]
  }

  /** Micros/scaled output → the public [[graft.ext.Sessionize.summary]]
    * schema. Decimal division keeps the 2 dp round exact. */
  private def publicFrame(out: Dataset[SessOut]): DataFrame =
    out.select(
      col("user_id"), col("session_idx"), col("n_events"),
      timestamp_micros(col("start_us")).as("start_ts"),
      timestamp_micros(col("end_us")).as("end_ts"),
      (expr("end_us div 1000000") - expr("start_us div 1000000"))
        .as("duration_s"),
      round(col("vs_sum").cast("decimal(18,0)") / lit(10000), 2)
        .cast("double").as("total_value"))

  /** Batch replay: the SAME fold over complete per-user groups — every
    * session closes, including the trailing open one. Registered as the
    * oracle-checked query (hash-matches the x18 window formulation). */
  def sessionSummaries(events: DataFrame, gapSeconds: Long,
                       userCol: String = "user_id", tsCol: String = "ts",
                       tieCol: String = "event_id",
                       valueCol: String = "value"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds ($gapSeconds) must be positive")
    val s = events.sparkSession
    import s.implicits._
    val typed = project(events, userCol, tsCol, tieCol, valueCol)
    val folded = typed.groupByKey(_.user)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, it, _) =>
          val (closed, open) = fold(user, it, gapSeconds, None, 0L)
          (closed ++ open.map(s0 =>
            SessOut(user, s0.idx, s0.n, s0.startUs, s0.lastUs, s0.vsSum)))
            .iterator
      }
    publicFrame(folded).orderBy("user_id", "session_idx")
  }

  /** The LIVE stream: watermarked append-mode session emission —
    * inline closes on gap, watermark-timeout closes on quiet. The
    * caller writes the returned frame with a streaming sink. */
  def sessionStream(events: DataFrame, gapSeconds: Long,
                    watermarkDelay: String = "10 minutes",
                    userCol: String = "user_id", tsCol: String = "ts",
                    tieCol: String = "event_id",
                    valueCol: String = "value"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds ($gapSeconds) must be positive")
    val s = events.sparkSession
    import s.implicits._
    val typed = project(
      events.withWatermark(tsCol, watermarkDelay),
      userCol, tsCol, tieCol, valueCol)
    val folded = typed.groupByKey(_.user)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // Watermark passed last + gap: the open session is final.
            val s0 = state.get
            // Keep the row (n = 0 sentinel) so the NEXT session of this
            // user continues the index sequence.
            state.update(SessState(s0.idx, 0L, 0L, 0L, 0L))
            Iterator.single(
              SessOut(user, s0.idx, s0.n, s0.startUs, s0.lastUs, s0.vsSum))
          } else {
            val prior = state.getOption.filter(_.n > 0L)
            // After a timeout emit the sentinel row carries the last
            // emitted index — new sessions resume the sequence.
            val idxBase = state.getOption.map(_.idx).getOrElse(0L)
            val (closed, open) = fold(user, it, gapSeconds, prior, idxBase)
            open match {
              case Some(o) =>
                state.update(o)
                // Timeout horizon must match the batch fold's gap rule,
                // which is strict-> on FLOOR-SECOND deltas: an event
                // anywhere in second floorSec(last)+gap is still
                // in-session, so the session may only time out once the
                // watermark clears the END of that second — raw
                // last_ms + gap_ms would fire up to a second early and
                // split a sub-second boundary event into a new session.
                state.setTimeoutTimestamp(
                  (Math.floorDiv(o.lastUs, 1000000L) + gapSeconds + 1) * 1000L)
              case None => ()
            }
            closed.iterator
          }
      }
    publicFrame(folded)
  }
}
