package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Kaplan–Meier survival estimation [Kaplan & Meier, "Nonparametric
  * Estimation from Incomplete Observations", JASA 1958] over user
  * lifetimes — the censoring-aware retention curve. A naive "fraction
  * still active after t days" systematically UNDERSTATES retention
  * because users whose observation window ends (the right-censored) are
  * counted as churned; KM removes them from the risk set at their
  * censoring time instead: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i), with d_i
  * the churn events at duration t_i and n_i the users still at risk.
  * This is the time-to-event counterpart of q119's cohort retention
  * triangle (which reports activity ratios, not a censoring-corrected
  * survival function).
  *
  * Reference tie: extends the reference's user-activity dashboard
  * (`unified_data_analytics.py` engagement rollups) along the lifetime
  * axis, the same way q119 extends it along the calendar axis.
  *
  * Determinism discipline (the q32/q89 fold-mirror pattern): every
  * factor 1 − d/n is one IEEE-exact integer division; the survival
  * products multiply those doubles in ascending-duration order via an
  * ordered list fold, so DuckDB's list_reduce replays them bit-for-bit
  * — no float-sum ordering exposure anywhere.
  *
  * 100 TB shape: ONE user-keyed corpus exchange (the min/max lifetime
  * aggregate); everything after lives on the duration grid, whose
  * cardinality is bounded by the observation window in DAYS (≤ a few
  * hundred rows at any corpus size). The reverse-cumulative risk-set
  * window and the O(D²) prefix folds are dimension-sized by that bound
  * — the documented global-window-over-metadata exception, same as the
  * q169/q181 grids. The horizon is a 1-row broadcast scalar.
  */
object Survival {

  /** KM life table over per-entity (duration, churned) observations.
    * `lifetimes` must have a `duration_days` LONG and a `churned`
    * BOOLEAN column. Output: one row per distinct duration with the
    * risk set, event/censor counts and the survival estimate.
    */
  def kaplanMeier(lifetimes: DataFrame): DataFrame = {
    val grid = lifetimes
      .groupBy(col("duration_days"))
      .agg(
        count(lit(1)).as("n_at"),
        coalesce(sum(when(col("churned"), lit(1L))), lit(0L)).as("n_churn"))
    // Risk set = everyone whose duration reached this point: a reverse
    // running sum over the duration grid (dimension-sized, see header).
    val w = Window.orderBy(col("duration_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = grid
      .withColumn("n_risk", sum(col("n_at")).over(w))
      .withColumn("factor",
        lit(1.0) - col("n_churn").cast("double") / col("n_risk").cast("double"))
    // Ascending-ordered cumulative product by exact list fold: collect
    // the (tiny) grid once, then each row's survival is the fold over
    // its prefix — O(D²) on D ≤ window-days rows, bit-replayable.
    risk
      .agg(sort_array(collect_list(struct(
        col("duration_days"), col("n_risk"), col("n_churn"), col("n_at"),
        col("factor")))).as("fs"))
      .select(col("fs"), posexplode(col("fs")).as(Seq("i", "r")))
      .select(
        col("r.duration_days").as("duration_days"),
        col("r.n_risk").as("n_risk"),
        col("r.n_churn").as("n_churn"),
        (col("r.n_at") - col("r.n_churn")).as("n_censored"),
        round(aggregate(
          transform(slice(col("fs"), lit(1), col("i") + lit(1)),
            x => x.getField("factor")),
          lit(1.0), (acc: Column, x: Column) => acc * x), 6).as("survival"))
      .orderBy(col("duration_days"))
  }

  /** Per-user lifetimes from the events stream: duration = first→last
    * activity in days; a user is CHURNED if their last event predates
    * the corpus horizon by more than `censorDays` (otherwise they were
    * still active when observation ended — right-censored).
    */
  def userLifetimes(events: DataFrame, censorDays: Int): DataFrame = {
    val horizon = events.agg(max(col("ts")).as("end_ts"))
    events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(horizon))
      .select(
        datediff(col("last_ts").cast("date"), col("first_ts").cast("date"))
          .cast("long").as("duration_days"),
        (col("last_ts") < col("end_ts") - expr(s"INTERVAL $censorDays DAYS"))
          .as("churned"))
  }

  /** q184: KM survival curve of user lifetimes, 7-day churn rule. */
  def kmQuery(s: SparkSession, dir: String): DataFrame =
    kaplanMeier(userLifetimes(Tables.events(s, dir), censorDays = 7))
}
