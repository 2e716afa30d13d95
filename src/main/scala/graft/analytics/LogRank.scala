package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-sample log-rank test [Mantel 1966; Peto & Peto 1972]: compare
  * two arms' survival curves under censoring — at every distinct event
  * time, arm A's observed churn d_A is set against its hypergeometric
  * expectation E_A = d·n_A/n given the risk sets, and
  * χ² = (Σ(d_A − E_A))²/ΣV with the hypergeometric variance V. This is
  * the INFERENCE layer on q184's Kaplan–Meier curves: KM draws the two
  * retention curves, log-rank says whether they differ beyond chance —
  * censoring-aware where a naive churn-rate comparison is biased.
  *
  * Exactness discipline: risk sets and churn counts are exact integers
  * on the day-grain duration grid; E and V are fixed-shape exact-ratio
  * doubles per grid row; the two sums fold in duration order (the
  * q192 discipline — never an order-free float sum); sqrt-free (χ²
  * reported, not z).
  *
  * 100 TB shape: ONE user-keyed corpus exchange (the q184 lifetime
  * aggregate, arms attached); everything after lives on the ≤
  * window-days duration grid — reverse-cumulative risk windows and the
  * final fold are the documented dimension-sized exception.
  */
object LogRank {

  /** One row: the log-rank comparison of `lifetimes` (duration_days
    * LONG, churned BOOLEAN, arm BOOLEAN).
    */
  def test(lifetimes: DataFrame): DataFrame = {
    val grid = lifetimes
      .groupBy(col("duration_days"))
      .agg(
        count(lit(1)).as("n_at"),
        coalesce(sum(when(col("arm"), 1L)), lit(0L)).as("n_at_a"),
        coalesce(sum(when(col("churned"), 1L)), lit(0L)).as("d"),
        coalesce(sum(when(col("churned") && col("arm"), 1L)), lit(0L))
          .as("d_a"))
    val w = Window.orderBy(col("duration_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = grid
      .withColumn("n_risk", sum(col("n_at")).over(w))
      .withColumn("n_risk_a", sum(col("n_at_a")).over(w))
      .filter(col("d") > 0L) // only event times contribute
    val terms = risk.select(col("duration_days"), col("d"), col("d_a"),
      (col("n_risk_a").cast("double") / col("n_risk").cast("double"))
        .as("p_a"),
      col("n_risk"), col("d").cast("double").as("dd"))
      .select(col("duration_days"), col("d_a"),
        (col("dd") * col("p_a")).as("e_a"),
        // hypergeometric variance; 0 when the risk set is exhausted
        when(col("n_risk") > 1L,
          col("dd") * col("p_a") * (lit(1.0) - col("p_a"))
            * (col("n_risk").cast("double") - col("dd"))
            / (col("n_risk") - 1L).cast("double"))
          .otherwise(lit(0.0)).as("v"))
    val folded = terms
      .agg(sort_array(collect_list(struct(col("duration_days"),
        col("d_a").cast("double").as("oa"), col("e_a"), col("v"))))
        .as("ts"))
      .select(
        aggregate(transform(col("ts"), t => t.getField("oa")),
          lit(0.0), (a: Column, x: Column) => a + x).as("o_a"),
        aggregate(transform(col("ts"), t => t.getField("e_a")),
          lit(0.0), (a: Column, x: Column) => a + x).as("e_a"),
        aggregate(transform(col("ts"), t => t.getField("v")),
          lit(0.0), (a: Column, x: Column) => a + x).as("v"))
    val arms = lifetimes.agg(
      coalesce(sum(when(col("arm"), 1L)), lit(0L)).as("n_a"),
      coalesce(sum(when(!col("arm"), 1L)), lit(0L)).as("n_b"))
    folded.crossJoin(broadcast(arms))
      .select(col("n_a"), col("n_b"),
        col("o_a").cast("long").as("observed_a"),
        round(col("e_a"), 4).as("expected_a"),
        round(when(col("e_a") > 0.0, col("o_a") / col("e_a")), 6)
          .as("o_over_e"),
        round(when(col("v") > 0.0,
          (col("o_a") - col("e_a")) * (col("o_a") - col("e_a"))
            / col("v")), 4).as("chi_sq"))
  }

  /** q197: do odd- and even-parity users churn differently? Log-rank
    * over the q184 lifetimes with parity arms.
    */
  def logRankQuery(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir).filter(col("user_id").isNotNull)
    val horizon = events.agg(max(col("ts")).as("end_ts"))
    val lt = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .crossJoin(broadcast(horizon))
      .select(
        datediff(col("last_ts").cast("date"), col("first_ts").cast("date"))
          .cast("long").as("duration_days"),
        (col("last_ts") < col("end_ts") - expr("INTERVAL 7 DAYS"))
          .as("churned"),
        (col("user_id") % 2L === 1L).as("arm"))
    test(lt)
  }
}
