package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-horizon deduplication: the streaming
  * `dropDuplicatesWithinWatermark` pattern and its exact batch twin.
  *
  * Semantics (batch twin, the deterministic contract): per key, scan
  * events in (t, event_id) order keeping an event iff it is MORE than
  * `horizonUs` after the last KEPT event — the "anchor hop". The first
  * event of a key is always kept; an event inside the horizon of the
  * current anchor is dropped and does NOT extend the horizon (matching
  * the streaming operator, whose state expiry is pinned to the FIRST
  * occurrence and not refreshed by dropped duplicates).
  *
  * Streaming equivalence is conditional, not general: the streaming
  * operator evicts state only when the watermark passes `first + delay`,
  * and the watermark moves at micro-batch boundaries — so an event
  * beyond the horizon can still be dropped if eviction hasn't run yet.
  * When consecutive batch-twin anchors are separated by more than
  * 2×delay the watermark provably clears the old entry first and the two
  * paths agree exactly; DedupWithinSpec pins that case. Outside it the
  * batch twin is the stricter, deterministic semantics (and the one the
  * oracle checks as q136). Inside the disagreement window the FIRST
  * divergence is always one-sided — late eviction can only cause extra
  * streaming drops, so streaming keeps ⊆ batch keeps — but a cascade can
  * then flip the direction: a streaming-dropped batch-anchor never
  * created state, so a later event inside THAT anchor's batch horizon
  * may be streaming-KEPT. DedupWithinSpec pins both shapes; the batch
  * twin stays the contract precisely because the streaming outcome
  * depends on micro-batch boundaries.
  *
  * Reference tie: the reference ingests each Yelp dump as an overwrite
  * (no incremental dedup); this is the §2.9 engine-addition row that
  * makes repeated deliveries of the same review stream idempotent
  * within a bounded re-delivery window.
  *
  * 100 TB shape: ONE exchange on the dedup key; the per-key scan is a
  * streaming iterator over that key's events (sorted in memory per key —
  * the same per-key bound every sessionizer carries, here (user, type)
  * which is finer than q122's user grain). Streaming state is one
  * timestamp per key with watermark-driven eviction — bounded by the
  * active-key set, never by history.
  */
object DedupWithin {

  /** 48 h: the driver events table spans a month with a median per-key
    * gap near two days, so this horizon exercises both branches heavily.
    */
  val HorizonUs: Long = 48L * 3600L * 1000000L

  case class KEv(user_id: Long, event_type: String, event_id: Long, t: Long)

  /** Batch twin: anchor-hop per (user_id, event_type). */
  def dedupWithin(events: Dataset[KEv],
      horizonUs: Long = HorizonUs): Dataset[KEv] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type)).flatMapGroups {
      (_, it) =>
        val sorted = it.toSeq.sortBy(e => (e.t, e.event_id))
        var last = Long.MinValue / 2 // sentinel: first event always kept
        sorted.iterator.filter { e =>
          if (e.t - last > horizonUs) { last = e.t; true } else false
        }
    }
  }

  /** Streaming path: bounded-state dedup keyed on (user_id, event_type).
    * Input must carry event-time column `ts`; `delay` is the duplicate
    * horizon AND the state lifetime (e.g. "48 hours").
    */
  def streamingDedup(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** q136: the batch twin over the events table — kept rows, oracled by
    * a per-key recursive anchor hop in DuckDB.
    */
  def dedupWithinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t"))
      .as[KEv]
    dedupWithin(evs).toDF()
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_micros(col("t")).as("ts"))
      .orderBy(col("user_id"), col("event_type"), col("ts"), col("event_id"))
  }
}
