package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cohort retention matrix — the canonical product-analytics rollup: group
  * users by first-seen week (the cohort), then for each week offset report
  * how many of that cohort were active and the retention ratio against the
  * cohort's own size. The same triangle every growth dashboard draws.
  *
  * Reference tie: the reference's user-activity dashboard rollups
  * (`unified_data_analytics.py`'s engagement aggregations) extended along
  * the time axis.
  *
  * 100 TB shape: the event stream collapses to DISTINCT (user, week)
  * FIRST — the only row-scale exchange, partial-aggregated map-side. The
  * first-seen week is a groupBy over that (already-narrow) activity table
  * keyed on user, re-joined on the same user key (AQE sees both sides
  * hash-partitioned on user — no extra exchange). Everything after is
  * dimension-sized: (cohort, offset) cells and the broadcast offset-0
  * slice for the denominator. Week arithmetic is integer (`div 7`), and
  * retention compares on round(·, 4).
  */
object Cohorts {

  /** (cohort_week, week_offset, n_active, n_cohort, retention) rows. */
  def retention(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val firstWeek = activity.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val cells = activity
      .join(firstWeek, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, week) is distinct already
    val sizes = cells.filter(col("week_offset") === 0L)
      .select(col("cohort_week"), col("n_active").as("n_cohort"))
    cells
      .join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("n_cohort"), 4))
      .select("cohort_week", "week_offset", "n_active", "n_cohort", "retention")
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def retentionQuery(s: SparkSession, dir: String): DataFrame =
    retention(Tables.events(s, dir))
}
