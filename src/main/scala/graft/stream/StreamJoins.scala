package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the attribution pattern
  * (match each click to the impression that preceded it within a horizon).
  *
  * Both sides carry a watermark and the join condition bounds event time
  * in BOTH directions (click after impression, within `within`), which is
  * exactly what lets Spark expire per-key state: an impression older than
  * watermark − horizon can never match a future click and is dropped from
  * the state store. Without the time bound the state grows forever — the
  * difference between a stream job that runs for months and one that
  * OOMs on day two.
  */
object StreamJoins {

  case class Impression(imp_id: Long, user_id: Long, imp_ts: java.sql.Timestamp)
  case class Click(click_id: Long, user_id: Long, click_ts: java.sql.Timestamp)

  /** Inner join: (impression, click) pairs where the click lands in
    * [imp_ts, imp_ts + within]. Works identically on batch DataFrames
    * (watermarks are no-ops there) and streaming ones.
    *
    * @param within  SQL interval string, e.g. "10 minutes" — both the
    *                attribution horizon and the allowed lateness
    */
  def attribution(
      impressions: DataFrame, clicks: DataFrame, within: String): DataFrame = {
    val i = impressions.withWatermark("imp_ts", within)
      .select(col("imp_id"), col("user_id").as("imp_user"), col("imp_ts"))
    val c = clicks.withWatermark("click_ts", within)
      .select(col("click_id"), col("user_id").as("click_user"), col("click_ts"))
    i.join(c,
        col("imp_user") === col("click_user")
          && col("click_ts") >= col("imp_ts")
          && col("click_ts") <= col("imp_ts") + expr(s"interval $within"))
      .select(col("imp_user").as("user_id"), col("imp_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }

  /** q59: the attribution join's BATCH twin over the real events table —
    * views as impressions, clicks as conversions, 1-hour horizon. Runs
    * the SAME `attribution` code (watermarks are analyzer no-ops in
    * batch), so the driver's DuckDB oracle checks the join semantics that
    * StreamJoinSpec separately proves identical on the streaming path
    * with MemoryStream inputs. Batch plan is a per-key equi-join with a
    * time post-filter — fine here (events per user are few); when BOTH
    * sides are dense per key, [[graft.operators.RangeJoin]]'s time
    * bucketing is the scale path.
    */
  def attributionQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val imps = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    attribution(imps, clicks, "1 hour")
      .orderBy(col("imp_id"), col("click_id"))
  }

  /** LEFT OUTER attribution: every impression row surfaces — matched
    * impressions with their click(s), unconverted ones with a NULL click
    * side. In streaming this is the semantically hard case: the null row
    * can only be emitted once the WATERMARK passes imp_ts + within
    * (before that a matching click could still arrive), so Spark holds
    * the impression in state exactly that long and emits the null on
    * expiry — outer results are late by one horizon, by design, and the
    * same state bound as the inner join still applies. In batch the
    * watermarks are no-ops and this is a plain left outer join, which is
    * what makes the q147 twin oracle-checkable while StreamJoinSpec
    * separately proves the expiry-emission behavior on MemoryStreams.
    */
  def attributionOuter(
      impressions: DataFrame, clicks: DataFrame, within: String): DataFrame = {
    val i = impressions.withWatermark("imp_ts", within)
      .select(col("imp_id"), col("user_id").as("imp_user"), col("imp_ts"))
    val c = clicks.withWatermark("click_ts", within)
      .select(col("click_id"), col("user_id").as("click_user"), col("click_ts"))
    i.join(c,
        col("imp_user") === col("click_user")
          && col("click_ts") >= col("imp_ts")
          && col("click_ts") <= col("imp_ts") + expr(s"interval $within"),
        "left_outer")
      .select(col("imp_user").as("user_id"), col("imp_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }

  /** q147: the outer attribution's batch twin — q59 plus the
    * unconverted-impression rows (the funnel's denominator, which the
    * inner join silently drops). Null click ids sort FIRST on both
    * engines by explicit direction.
    */
  def attributionOuterQuery(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val imps = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    attributionOuter(imps, clicks, "1 hour")
      .orderBy(col("imp_id"), col("click_id").asc_nulls_first)
  }

  /** Watermarked streaming deduplication: drop re-deliveries of the same
    * `idCol` (at-least-once sources re-send), holding only ids younger
    * than the watermark in state. Without the watermark the seen-id state
    * grows without bound; with it, an id older than `lateness` can only
    * reappear behind the watermark, where it is dropped as late anyway.
    */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
      lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCol)
}
