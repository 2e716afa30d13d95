package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** User-level contribution capping before aggregate release — the
  * sensitivity-bounding step every differentially-private or
  * abuse-resistant aggregation pipeline runs first [Wilson et al.,
  * "Differentially private SQL with bounded user contribution",
  * PoPETS 2020: the reservoir-per-(user, partition) stage]: a released
  * per-group metric whose groups one hyperactive user can dominate is
  * neither private nor robust, so each user's contribution to each
  * group is capped at C rows BEFORE the aggregate, and the release
  * reports what the cap discarded — silent clamping would make the
  * published metric unauditable.
  *
  * The kept rows are each (user, group)'s FIRST C by (ts, event_id) —
  * a deterministic, replayable reservoir (arrival order, ties broken by
  * id), not a random one, so the DuckDB oracle replays row-for-row.
  *
  * Scale shape: one (user_id, event_type)-keyed window ranks arrivals
  * within each user-group cell (cells are user-sized — thousands of
  * rows, never corpus-sized; this is the q45 sessionization exchange,
  * not a global sort), then ONE group aggregate emits capped and
  * uncapped measures side by side via conditional sums — the cap
  * never forces a second corpus pass.
  */
object CappedContribution {

  val Cap = 10

  /** Per-group release over events: (event_type, n_users, n_rows,
    * n_rows_capped, sum_value, sum_value_capped, clamp_loss_pct) with
    * each user's contribution per group capped at `cap` rows.
    */
  def cappedRelease(events: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_rows"),
        sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_rows_capped"),
        round(sum(col("value")), 2).as("sum_value"),
        round(sum(when(col("rn") <= cap, col("value")).otherwise(0.0)), 2)
          .as("sum_value_capped"))
      .withColumn("clamp_loss_pct",
        round((col("n_rows") - col("n_rows_capped")) * 100.0 / col("n_rows"),
          4))
      .orderBy(col("event_type"))
  }

  /** q174: the events table released at cap = 10 per (user, type). */
  def cappedReleaseQuery(s: SparkSession, dir: String): DataFrame =
    cappedRelease(Tables.events(s, dir), Cap)
}
