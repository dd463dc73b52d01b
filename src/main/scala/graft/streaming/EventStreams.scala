package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9): the reference only has
  * pull-based batch iteration (S5); these are the EXT streaming operators a
  * 100 TB event pipeline needs, built on watermarks + windowed aggregation +
  * mapGroupsWithState. Inputs use the `events` schema
  * (event_id, ts TIMESTAMP, user_id, event_type, value).
  *
  * Everything here is incremental: tumbling/sliding windows aggregate with
  * partial state per window, session state is bounded by the watermark, and
  * dedup state expires with it — no unbounded driver or executor state.
  */
object EventStreams {

  /** Tumbling-window counts per event type with a watermark for late data. */
  def hourlyCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_v"))

  /** Sliding-window (1h window, 15m slide) rates. */
  def slidingRates(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"), col("n"))

  /** Stateful exactly-once-per-key dedup, state genuinely bounded by the
    * watermark: `dropDuplicatesWithinWatermark` evicts a key's state once
    * the watermark passes it. Plain `dropDuplicates("event_id")` would keep
    * every id forever — its eviction only engages when the event-time
    * column is among the dedup KEYS.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  final case class Evt(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionAgg(user_id: Long, n_events: Long, last_ts: Long)
  final case class SessionOut(user_id: Long, n_events: Long, closed: Boolean)

  /** The same gap-sessionization via the BUILT-IN `session_window`
    * aggregation — the watermark-native dual of [[sessionize]] (and the
    * streaming dual of batch q22): per-user sessions grow while events
    * arrive within `gap`, and a session emits exactly once, with its final
    * count, when the watermark passes its end (Append semantics). Where
    * [[sessionize]] closes a session only when that USER's next event
    * arrives past the gap (and additionally streams running counts),
    * this one closes on global event-time progress — the right tool when
    * downstream wants only finalized sessions and eviction must not wait
    * on per-key traffic. State is bounded by the watermark, merge-able
    * map-side like any windowed agg. EventStreamsSpec pins the two
    * formulations emitting IDENTICAL closed sessions on one input.
    */
  def sessionizeBuiltin(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"))

  /** Custom per-user session state via flatMapGroupsWithState: events more
    * than `gapMs` after the previous one close the session and open a new
    * one. Every session CLOSED within the batch emits its final count
    * (`closed = true`) — the earlier mapGroupsWithState version could only
    * emit ONE row per user per trigger, so a session that opened and
    * closed between two triggers lost its count unrecoverably — and the
    * still-open session emits its running count (`closed = false`). State
    * stays a single (count, last_ts) pair per user; pair with a
    * watermark-driven TTL in production to bound key cardinality.
    */
  def sessionize(events: Dataset[Evt], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Evt], state: GroupState[SessionAgg]) =>
          val evts = batch.toSeq.sortBy(_.ts.getTime)
          val prev = state.getOption.getOrElse(SessionAgg(uid, 0L, 0L))
          var n = prev.n_events
          var last = prev.last_ts
          val closedSessions = Seq.newBuilder[SessionOut]
          evts.foreach { e =>
            // the inactivity gap closes the session: emit its final count
            // before resetting for the new one
            if (last > 0 && e.ts.getTime - last > gapMs) {
              closedSessions += SessionOut(uid, n, closed = true)
              n = 0L
            }
            n += 1
            last = e.ts.getTime
          }
          state.update(SessionAgg(uid, n, last))
          (closedSessions.result() :+ SessionOut(uid, n, closed = false)).iterator
      }
  }
}
