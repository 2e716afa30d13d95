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
