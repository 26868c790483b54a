package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each key's events into sessions
  * where consecutive events are less than `gap` apart, and aggregate
  * per session. The standard shape behind "user activity sessions",
  * burst detection, and per-visit rollups of web-scale event logs.
  *
  * Built on Spark's native `session_window` aggregate — a session opens
  * at an event and absorbs every later event within `gap` of the
  * session's current last event, INCLUSIVE: an event at exactly
  * `prev + gap` still joins; a new session starts only when the gap is
  * strictly exceeded (verified against a lag/cumsum reconstruction in
  * SessionizeSpec — Spark merges candidate windows whose `[ts, ts+gap]`
  * ranges touch, not just overlap).
  *
  * Scale shape: one hash-shuffle of the (keys, ts, agg-input) tuple on
  * the keys, then a partition-local sort-merge of windows — the same
  * cost envelope as any keyed aggregation with a sort, no pairwise
  * blow-up, no driver state. In STREAMING mode the identical groupBy
  * runs incrementally against the session-window state store: call
  * [[sessionizeStream]] with a watermark and sessions emit (append
  * mode) once the watermark passes their close — bounded state,
  * exactly-once with checkpointing.
  *
  * Reference scope: the reference has no temporal operators; engine
  * extension for event-shaped data, sibling of [[AsOfJoin]] and
  * [[RangeJoin]].
  */
object Sessionize {

  /** Per-session aggregation over a batch frame.
    *
    * @param keys session identity columns (e.g. user)
    * @param tsCol event-time column (timestamp / timestamp_ntz)
    * @param gap  inactivity gap closing a session, e.g. "30 minutes"
    * @param aggs aggregate columns (each must be aliased)
    * @return keys ++ session_start (first event) ++ session_last (last
    *         event) ++ aggs, one row per (keys, session); null keys or
    *         timestamps are dropped (a null ts belongs to no session)
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gap: String, aggs: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(aggs.nonEmpty, "sessionize needs at least one aggregate")
    val firstAggs =
      min(col(tsCol)).as("session_start") +: max(col(tsCol)).as("session_last") +: aggs
    df.where((keys :+ tsCol).map(col(_).isNotNull).reduce(_ && _))
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(firstAggs.head, firstAggs.tail: _*)
      .drop("session_window")
  }

  /** Streaming flavor: identical grouping against the session-window
    * state store. `delay` is the watermark (how late events may
    * arrive); in append mode a session emits once the watermark passes
    * `last event + gap`. */
  def sessionizeStream(df: DataFrame, keys: Seq[String], tsCol: String,
                       gap: String, delay: String, aggs: Seq[Column]): DataFrame =
    sessionize(df.withWatermark(tsCol, delay), keys, tsCol, gap, aggs)
}
