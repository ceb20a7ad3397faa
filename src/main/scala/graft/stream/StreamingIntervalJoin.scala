package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S18 — watermarked STREAM-STREAM interval join: the serving form of
  * the X22 range join ([[graft.ext.RangeJoin]]) — two live event
  * streams joined within a per-key time bound (impressions ⋈
  * conversions within N hours per user, the attribution shape), the
  * one Structured Streaming join vocabulary item the s1–s17 lanes
  * never exercised (VERDICT r13 missing #2: every prior lane is a
  * stateless projection, a stream-STATIC join, or a custom-state
  * fold).
  *
  * Both sides carry an event-time watermark and the join condition is
  * key equality PLUS a closed time range on the raw event-time
  * columns — exactly the form Structured Streaming needs to bound the
  * join state: a buffered left row is evictable once the right-side
  * watermark passes `leftTime + withinSeconds + delaySeconds`, and
  * vice versa, so state is O(key-rate × window), never O(stream). A
  * late row (older than watermark − delay) is DROPPED, not joined —
  * the documented append-mode semantics, pinned live in
  * StreamingIntervalJoinSpec.
  *
  * The same code runs batch frames unchanged (`withWatermark` on a
  * batch Dataset is eliminated by the optimizer), which is what the
  * registered `s18_stream_join` lane hash-checks against the plain
  * BETWEEN-join DuckDB oracle (the s14/x42 shared-oracle contract);
  * on complete in-order data the stream emits exactly the batch join.
  */
object StreamingIntervalJoin {

  /** `left ⋈ right` on `keyCol` with `right.rightTime` in
    * `[left.leftTime, left.leftTime + withinSeconds]` (closed bounds —
    * the X22/BETWEEN convention). Right-side columns come out
    * `prefix`-renamed (the self-join disambiguation: both sides
    * usually derive from one source). `delaySeconds` is the shared
    * late-data tolerance on both watermarks.
    *
    * `joinType` = `"inner"` (s18), `"left_outer"` (s20, VERDICT r14
    * missing #2) or `"full_outer"` (s22, VERDICT r15 next #6 — the
    * last interval-join vocabulary item): the attribution shape
    * usually needs the impression WITHOUT a conversion too, emitted
    * null-extended exactly once — and only once the watermark passes
    * `leftTime + withinSeconds + delaySeconds`, the point where
    * Structured Streaming can PROVE no matching right row can still
    * arrive (eviction time = match completeness, which is why the
    * outer forms demand watermarks where the inner form merely
    * benefits from them). The full-outer form adds the symmetric
    * claim: an orphaned CONVERSION (no impression within the window)
    * also emits null-extended exactly once, after the left watermark
    * passes ITS eviction bound `rightTime + delaySeconds` (the right
    * row can only match left rows with `leftTime ≥ rightTime −
    * within`, all provably absent once the left watermark clears
    * `rightTime`). A late row after its side's watermark never
    * resurrects anything (dropped at ingest, the buffered partner
    * already evicted) — both sides pinned live in
    * StreamingIntervalJoinSpec. On batch frames the watermark is
    * optimizer-eliminated and these are the plain LEFT/FULL JOIN
    * BETWEEN, the registered `s20`/`s22` oracles.
    *
    * On the outer forms the join key survives null-extension:
    * `keyCol` comes out `coalesce(left, right)` (a full-outer row has
    * it on exactly one side; without the coalesce the right-only rows
    * would lose their key with the dropped `prefix` column). */
  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
                 leftTime: String, rightTime: String,
                 withinSeconds: Long, delaySeconds: Long = 3600L,
                 prefix: String = "r_",
                 joinType: String = "inner"): DataFrame = {
    require(withinSeconds >= 0, s"withinSeconds ($withinSeconds) < 0")
    require(delaySeconds >= 0, s"delaySeconds ($delaySeconds) < 0")
    require(joinType == "inner" || joinType == "left_outer" ||
        joinType == "full_outer",
      s"joinType ($joinType) must be 'inner', 'left_outer' or " +
        "'full_outer' — the stream-stream interval vocabulary this " +
        "operator serves")
    val l = left.withWatermark(leftTime, s"$delaySeconds seconds")
    val r = right
      .select(right.columns.map(c => col(c).as(s"$prefix$c")).toSeq: _*)
      .withWatermark(s"$prefix$rightTime", s"$delaySeconds seconds")
    val joined = l.join(r,
      col(keyCol) === col(s"$prefix$keyCol") &&
        col(s"$prefix$rightTime") >= col(leftTime) &&
        col(s"$prefix$rightTime") <=
          col(leftTime) + expr(s"INTERVAL $withinSeconds SECONDS"),
      joinType)
    val keyed =
      if (joinType == "full_outer")
        joined.withColumn(keyCol,
          coalesce(col(keyCol), col(s"$prefix$keyCol")))
      else joined
    keyed.drop(s"$prefix$keyCol")
  }
}
