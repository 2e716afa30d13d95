package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** Typed sessionization — the `KeyValueGroupedDataset` counterpart of
  * q45's window-based gaps-and-islands, sharing ONE core session builder
  * between the batch and streaming paths:
  *
  *   - batch: `groupByKey(user).flatMapGroups` sorts each user's events
  *     and cuts on the 30-minute gap — byte-for-byte the q45 semantics
  *     (same oracle SQL shape), exercised as q122;
  *   - streaming: `flatMapGroupsWithState` with event-time timeout keeps
  *     ONE open session per user in state, merges each micro-batch into
  *     it (min/max bounds, so in-gap out-of-order arrivals are exact),
  *     emits a session only when the watermark passes its gap horizon.
  *
  * Reference tie: the reference's review-stream design (SURVEY.md §2.9's
  * event-time discussion) — sessions are the canonical "custom state"
  * streaming aggregate that tumbling/sliding windows cannot express.
  *
  * 100 TB shape (batch): the ONLY exchange is the groupByKey on user_id;
  * the per-group sort is in-memory per USER (bounded by per-user event
  * cardinality — the same bound every sessionizer carries), never a
  * window over the full table. Streaming state is O(1) per active user
  * (three longs), not a buffer of events.
  */
object Sessionize {

  val GapUs: Long = 30L * 60L * 1000000L

  case class Ev(user_id: Long, event_id: Long, t: Long)
  case class Sess(user_id: Long, session_id: Long, n_events: Long,
                  start_us: Long, end_us: Long, duration_sec: Double)
  /** Open-session state: bounds + count + the next session ordinal for
    * this user (no event buffer). */
  case class Open(start_us: Long, end_us: Long, n_events: Long, next_sid: Long)

  /** Spark's round() is HALF_UP on the exact double — math.rint (banker's)
    * would diverge at .0005 boundaries, which micro-second durations hit.
    */
  private def round3(x: Double): Double =
    BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Cut a (t, event_id)-sorted event sequence on the gap. */
  private def cut(user: Long, sorted: Seq[Ev]): Seq[Sess] = {
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
    var sid = 0L; var start = 0L; var end = 0L; var n = 0L
    sorted.foreach { e =>
      if (n == 0L || e.t - end > GapUs) {
        if (n > 0L) out += Sess(user, sid, n, start, end,
          round3((end - start) / 1000000.0))
        sid += 1L; start = e.t; end = e.t; n = 1L
      } else { end = math.max(end, e.t); n += 1L }
    }
    out += Sess(user, sid, n, start, end, round3((end - start) / 1000000.0))
    out.toSeq
  }

  /** Batch path: q45 semantics through the typed API. */
  def sessions(events: Dataset[Ev]): Dataset[Sess] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (u, it) =>
      cut(u, it.toSeq.sortBy(e => (e.t, e.event_id))).iterator
    }
  }

  def typedSessionsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .as[Ev]
    sessions(evs)
      .toDF()
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q135's TTL knob: 6 h of event time past the close horizon — chosen
    * so the driver events table exercises BOTH branches (at sf0.001,
    * ~60% of returning users restart, ~40% continue). */
  val TombstoneTtlUs: Long = 6L * 3600L * 1000000L

  /** The TTL tombstone semantics as a BATCH second pass over the session
    * table: a session whose gap since the user's previous session exceeds
    * gap+ttl RESTARTS the per-user ordinal at 1 (the streaming tombstone
    * would have expired before the first event arrived); `restarted`
    * marks exactly those sessions. First-ever sessions take ordinal 1
    * unmarked — no tombstone existed to expire.
    *
    * 100 TB shape: both windows run over the SESSIONS table partitioned
    * by user — bounded by per-user session cardinality, the same bound
    * the sessionizer itself carries; never a window over raw events.
    */
  def ttlOrdinals(sess: DataFrame, ttlUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("start_us"), col("end_us"))
    sess
      .withColumn("restarted",
        coalesce(
          col("start_us") - lag(col("end_us"), 1).over(w) > lit(GapUs + ttlUs),
          lit(false)))
      .withColumn("epoch",
        sum(when(col("restarted"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("session_id",
        row_number().over(Window
          .partitionBy(col("user_id"), col("epoch"))
          .orderBy(col("start_us"), col("end_us"))).cast("long"))
      .select(col("user_id"), col("session_id"), col("restarted"),
        col("n_events"), col("start_us"), col("end_us"), col("duration_sec"))
  }

  /** q135: q122's sessionization under a finite tombstone TTL — the
    * driver-visible batch cut of [[streamingSessions]]'s
    * `tombstoneTtlUs = Some(...)` mode (parity pinned in SessionizeSpec).
    * Ordered by (user, start): the TTL-restarting `session_id` is not
    * unique per user, start is.
    */
  def ttlSessionsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .as[Ev]
    ttlOrdinals(sessions(evs).toDF(), TombstoneTtlUs)
      .orderBy(col("user_id"), col("start_us"))
  }

  /** Exact event-time microseconds: `getTime` truncates sub-millisecond
    * precision, so add back the micros-within-millisecond from the nanos
    * field — the batch path reads `unix_micros`, and parity demands the
    * same resolution on both sides.
    */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + ts.getNanos / 1000 % 1000

  /** Streaming path: one open session per user in state; emits a session
    * once the event-time watermark passes `end + gap`. Emitted sessions
    * carry the same 1-based per-user ordinal as the batch cut: the next
    * ordinal rides the state (one long), assigned at close time in
    * chronological order. After a timeout-close the state degrades to a
    * counter tombstone (never removed), so a user who returns days later
    * continues their sequence instead of reusing an emitted id.
    *
    * Each micro-batch merges into the open session by INTERVAL arithmetic:
    * the previous open session ([start, end], count) and the batch's
    * sorted events are merged chronologically with the strict->gap cut —
    * so an out-of-order arrival inside the open gap lands exactly, and a
    * straggler older than `start − gap` forms its OWN earlier session
    * instead of silently stretching the open one backwards.
    *
    * Input must carry an event-time watermark on `ts`, and the watermark
    * delay must not exceed the session gap: a straggler predating an
    * ALREADY-EMITTED session would need that session re-opened, which
    * append-mode streaming cannot do (with delay ≤ gap, such an event is
    * later than the watermark that emitted it and is filtered as late).
    *
    * @param tombstoneTtlUs optional bound on counter-tombstone lifetime:
    *   None (default) keeps one tombstone per ever-seen user forever —
    *   exact ordinals at O(users) state; Some(ttl) expires a tombstone
    *   `ttl` microseconds of EVENT time after the session it closed, so
    *   state is bounded by the active-user set at the cost that a user
    *   returning after expiry restarts their ordinal sequence at 1 (the
    *   100 TB state-compaction escape hatch).
    */
  def streamingSessions(events: Dataset[(Long, Long, java.sql.Timestamp)],
                        tombstoneTtlUs: Option[Long] = None)
      : Dataset[Sess] = {
    import events.sparkSession.implicits._
    // NOTE: group the watermarked tuples directly — a .map() here would
    // re-serialize and silently drop the event-time watermark attribute,
    // and the event-time timeout below would refuse to run
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, Sess](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[Open]) =>
          val it = rows.map { case (u, id, ts) => Ev(u, id, micros(ts)) }
          if (state.hasTimedOut) {
            val o = state.get
            if (o.n_events == 0L) {
              // an expired tombstone (TTL path only — with no TTL the
              // re-arm below is effectively never): drop the counter;
              // the ordinal restarts at 1 if this user ever returns
              state.remove()
              Iterator.empty
            } else {
              // keep a COUNTER TOMBSTONE instead of removing the state: a
              // returning user's next session must continue the ordinal
              // sequence, not reuse an emitted id. One state row per
              // ever-seen user is the price of exact numbering (bounded by
              // tombstoneTtlUs when set). The re-arm timestamp matters:
              // the fired timestamp stays in the state store, and without
              // a new one the tombstone would "time out" again every batch.
              // The tombstone KEEPS the closed session's end: it is the
              // boundary the next arrival measures its TTL gap against
              // (event-time-exact restarts, not watermark-timing ones).
              state.update(Open(0L, o.end_us, 0L, o.next_sid + 1L))
              state.setTimeoutTimestamp(tombstoneTtlUs
                // clamp above the watermark: a flush event may already
                // have pushed it past end+gap+ttl, and an in-the-past
                // timeout timestamp is rejected by the state store
                .map(ttl => math.max((o.end_us + GapUs + ttl) / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
                .getOrElse(Long.MaxValue / 2))
              Iterator.single(Sess(user, o.next_sid, o.n_events, o.start_us,
                o.end_us, round3((o.end_us - o.start_us) / 1000000.0)))
            }
          } else {
            val sorted = it.toSeq.sortBy(e => (e.t, e.event_id))
            var nextSid = state.getOption.map(_.next_sid).getOrElse(1L)
            // TTL restarts are EVENT-TIME exact: any boundary whose gap
            // exceeds gap+ttl resets the ordinal to 1 — the same cut the
            // batch twin ([[ttlOrdinals]]) makes — independent of whether
            // the watermark got around to firing the tombstone's expiry
            // timeout first (that path stays the state-CLEANUP bound).
            val restartGapUs = tombstoneTtlUs.map(GapUs + _)
            // a counter tombstone contributes no interval, but its END is
            // the closed session's end: the first new session's boundary
            val tombstoneEnd = state.getOption
              .filter(o => o.n_events == 0L && o.end_us > 0L).map(_.end_us)
            // chronological interval merge: previous open session + events
            val intervals =
              (state.getOption.filter(_.n_events > 0L)
                  .map(o => Open(o.start_us, o.end_us, o.n_events, 0L)).toSeq
                ++ sorted.map(e => Open(e.t, e.t, 1L, 0L)))
                .sortBy(iv => (iv.start_us, iv.end_us))
            if (intervals.isEmpty) Iterator.empty
            else {
              val merged = scala.collection.mutable.ArrayBuffer.empty[Open]
              intervals.foreach { iv =>
                if (merged.nonEmpty && iv.start_us - merged.last.end_us <= GapUs) {
                  val c = merged.last
                  merged(merged.length - 1) = Open(c.start_us,
                    math.max(c.end_us, iv.end_us), c.n_events + iv.n_events, 0L)
                } else merged += iv
              }
              // all but the last (chronologically open) interval close
              // now; every boundary first applies the TTL restart rule
              val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
              var prevEnd = tombstoneEnd
              merged.zipWithIndex.foreach { case (iv, i) =>
                if (restartGapUs.exists(g =>
                    prevEnd.exists(pe => iv.start_us - pe > g)))
                  nextSid = 1L
                if (i < merged.length - 1) {
                  out += Sess(user, nextSid, iv.n_events, iv.start_us,
                    iv.end_us, round3((iv.end_us - iv.start_us) / 1000000.0))
                  nextSid += 1L
                } else {
                  state.update(Open(iv.start_us, iv.end_us, iv.n_events, nextSid))
                  state.setTimeoutTimestamp((iv.end_us + GapUs) / 1000L)
                }
                prevEnd = Some(iv.end_us)
              }
              out.iterator
            }
          }
      }
  }

  /** End-to-end composition: closed streaming sessions upserted into a
    * versioned MERGE snapshot table ([[Ingest.drainStreamMerge]]). The
    * MERGE key makes the sink convergent under at-least-once delivery: a
    * session row re-emitted after a restart (or re-drained from a stale
    * checkpoint) rewrites its one row instead of appending a duplicate,
    * so the table always equals the batch cut of the events seen so far
    * — the lakehouse landing a session pipeline actually needs, vs the
    * raw append sink whose output is only exactly-once per query
    * instance.
    *
    * Key choice is MODE-DEPENDENT. Without a TTL the key is
    * (user_id, session_id): ordinals are unique forever, and a replay
    * that stretches a session (late in-gap data) rewrites that ordinal's
    * row exactly. WITH a TTL, ordinals RESTART at 1, so (user,
    * session_id) is no longer unique — a restarted session would
    * overwrite the user's first session. The TTL key is therefore
    * (user_id, start_us): session starts are unique per user (sessions
    * are gap-separated intervals), restarts included. The trade: a
    * cross-instance replay whose late straggler stretches a session's
    * START backward (admissible only within the gap) re-keys that
    * session and leaves the superseded row behind — bounded staleness
    * the sid key doesn't have, in exchange for restart correctness the
    * sid key can't give.
    *
    * Returns the latest committed snapshot path (None if nothing closed).
    */
  def drainSessionsMerge(
      events: Dataset[(Long, Long, java.sql.Timestamp)],
      tablePath: String,
      checkpoint: String,
      tombstoneTtlUs: Option[Long] = None): Option[String] = {
    val keyExpr =
      if (tombstoneTtlUs.isDefined)
        concat_ws("#", col("user_id"), col("start_us"))
      else concat_ws("#", col("user_id"), col("session_id"))
    val sess = streamingSessions(events, tombstoneTtlUs).toDF()
      .withColumn("sess_key", keyExpr)
    Ingest.drainStreamMerge(sess, "sess_key",
      Seq("user_id", "session_id", "n_events", "start_us", "end_us",
        "duration_sec"),
      tablePath, checkpoint)
  }
}
