package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregations — the engine's streaming posture
  * beyond the reference's file-granularity micro-batching (the reference
  * has no watermarks or event-time windows, SURVEY.md §2.9; the review
  * `date` column is a genuine event-time axis, so the engine wires them in).
  *
  * Works identically over a streaming or batch DataFrame (same API — the
  * watermark is a no-op in batch), so each operator is unit-testable on
  * batch data and deployable on `readStream` unchanged.
  */
object WindowedAggs {

  /** Tumbling event-time window aggregation with a watermark bounding
    * state: counts + value sum per (window, event_type). Late rows beyond
    * `lateness` are dropped instead of growing state forever — the property
    * that makes this run indefinitely at scale.
    */
  def tumbling(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window variant (overlapping windows). */
  def sliding(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "15 minutes",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Custom sessionization state machine via `mapGroupsWithState`
    * (the arbitrary-stateful path for semantics windowed aggs can't
    * express): events within `gapMs` of each other belong to one session.
    * A processing-time timeout of `gapMs` flushes idle users' state — in a
    * long-running stream, keys stop accumulating once their user goes
    * quiet (timeouts never fire in batch, where state dies with the query).
    *
    * In streaming, emits one row per updated session per micro-batch; in
    * batch (as used by the spec), each group is processed once with all its
    * events.
    */
  def sessionize(
      spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[UserSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSession](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: emit the stored session one final time, drop state
            val st = state.get
            state.remove()
            UserSession(userId, new Timestamp(st.start), new Timestamp(st.last),
              st.n, st.total)
          } else {
            // fold this batch's events (sorted by event time) into the
            // state, tracking only the LAST session — prior sessions closed
            // by the gap rule are summarized into it for the single-output
            // shape; sessionizeAll emits each.
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(
              SessionState(Long.MaxValue, Long.MinValue, 0, 0.0))
            sorted.foreach { e =>
              val t = e.ts.getTime
              st =
                if (st.n == 0 || t - st.last <= gapMs)
                  SessionState(math.min(st.start, t), math.max(st.last, t),
                    st.n + 1, st.total + e.value)
                else // gap exceeded: start a fresh session
                  SessionState(t, t, 1, e.value)
            }
            state.update(st)
            state.setTimeoutDuration(gapMs)
            UserSession(userId, new Timestamp(st.start), new Timestamp(st.last),
              st.n, st.total)
          }
      }
  }

  /** flatMapGroupsWithState variant emitting EVERY session the gap rule
    * closes, plus the still-open tail — the full sessionization semantics
    * [[sessionize]]'s single-output shape simplifies away.
    *
    * Output contract: gap-closed rows are final; the OPEN tail session is
    * provisional and re-emitted (extended) on each micro-batch that touches
    * the user, until the gap rule or the idle timeout closes it — consumers
    * needing exactly-one-row-per-session should upsert on (user_id,
    * session_start). The processing-time timeout flushes and removes idle
    * users' state (never fires in batch).
    */
  def sessionizeAll(
      spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[UserSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(UserSession(userId, new Timestamp(st.start),
              new Timestamp(st.last), st.n, st.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ListBuffer[UserSession]()
            var st = state.getOption.getOrElse(
              SessionState(Long.MaxValue, Long.MinValue, 0, 0.0))
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.n == 0 || t - st.last <= gapMs) {
                st = SessionState(math.min(st.start, t), math.max(st.last, t),
                  st.n + 1, st.total + e.value)
              } else {
                closed += UserSession(userId, new Timestamp(st.start),
                  new Timestamp(st.last), st.n, st.total)
                st = SessionState(t, t, 1, e.value)
              }
            }
            state.update(st)
            state.setTimeoutDuration(gapMs)
            (closed += UserSession(userId, new Timestamp(st.start),
              new Timestamp(st.last), st.n, st.total)).iterator
          }
      }
  }

  /** Spark's NATIVE `session_window` aggregation — the declarative
    * API-surface twin of the engine's [[sessionize]]/[[Sessionize]]
    * state machines, usable in batch AND streaming with the same line.
    * Boundary semantics MATCH the engine's `diff > gap` cut — measured,
    * not assumed: a planted pair exactly `gap` apart MERGES into one
    * window (SessionWindowSpec pins it against both implementations),
    * so the q149 oracle breaks strictly on diff > gap. The reported
    * window end is last event + gap.
    */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** q149: per-user 30-minute native session windows over events. */
  def sessionWindowQuery(s: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(graft.Tables.events(s, dir), "30 minutes")
}
