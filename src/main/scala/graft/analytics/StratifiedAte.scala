package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stratification-adjusted treatment effect [Cochran, "The
  * Effectiveness of Adjustment by Subclassification", 1968 — the
  * pre-model ancestor of propensity-score stratification]: when
  * treatment correlates with a covariate, the raw treated-vs-control
  * gap confounds the effect with the covariate; stratify on the
  * covariate's equi-depth bins, take the within-stratum gap, and
  * weight by stratum size. The readout reports BOTH the naive and the
  * adjusted ATE — their difference IS the measured confounding — plus
  * a per-stratum balance diagnostic (share treated), which is how an
  * analyst sees whether the strata support the comparison at all.
  * Completes the causal quartet: q180 randomized, q191 panel, q189
  * targeting, q199 observational cross-section.
  *
  * Exactness discipline: per-(stratum, arm) cells are exact integer
  * cents/counts; each mean is one exact division; the stratum-weighted
  * sum folds in stratum order (the q192 discipline).
  *
  * 100 TB shape: the q189 decile cut (one corpus aggregate + a
  * broadcast score→decile map) then ONE (stratum, arm) cell aggregate;
  * the weighted fold runs over ≤ 10·2 cells.
  */
object StratifiedAte {

  /** One row: naive vs stratification-adjusted ATE over `units`
    * (unit_id, score, treated, cents outcome) with the q189 decile
    * strata.
    */
  def estimate(units: DataFrame): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val cells = Uplift.withDeciles(units)
      .groupBy(col("decile"))
      .agg(
        coalesce(sum(when(col("treated"), 1L)), lit(0L)).as("n_t"),
        coalesce(sum(when(col("treated"), d(col("cents")))),
          lit(0L).cast("decimal(38,0)")).as("s_t"),
        coalesce(sum(when(!col("treated"), 1L)), lit(0L)).as("n_c"),
        coalesce(sum(when(!col("treated"), d(col("cents")))),
          lit(0L).cast("decimal(38,0)")).as("s_c"))
      // the ≤10-row cell grid feeds BOTH the totals and the supported
      // terms — checkpointed so the corpus pipeline plans once
      .localCheckpoint()
    val tot = cells.agg(
      sum(col("n_t")).as("nt"), sum(col("s_t")).as("st"),
      sum(col("n_c")).as("nc"), sum(col("s_c")).as("sc"),
      count(lit(1)).as("n_strata"),
      // strata where one arm is EMPTY cannot support a comparison —
      // they are excluded from the adjusted estimate and COUNTED so
      // the exclusion is visible, never silent
      coalesce(sum(when(col("n_t") === 0L || col("n_c") === 0L,
        col("n_t") + col("n_c"))), lit(0L)).as("n_unsupported"))
    val terms = cells
      .filter(col("n_t") > 0L && col("n_c") > 0L)
      .select(col("decile"),
        ((col("n_t") + col("n_c")).cast("double")
          * (col("s_t").cast("double") / col("n_t").cast("double")
            - col("s_c").cast("double") / col("n_c").cast("double")))
          .as("w_gap"),
        (col("n_t") + col("n_c")).as("n_d"),
        (col("n_t").cast("double")
          / (col("n_t") + col("n_c")).cast("double")).as("share_t"))
    val folded = terms
      .agg(sort_array(collect_list(struct(col("decile"), col("w_gap"),
        col("n_d").cast("double").as("nd"), col("share_t")))).as("ts"))
      .select(
        aggregate(transform(col("ts"), t => t.getField("w_gap")),
          lit(0.0), (a: Column, x: Column) => a + x).as("sum_w_gap"),
        aggregate(transform(col("ts"), t => t.getField("nd")),
          lit(0.0), (a: Column, x: Column) => a + x).as("n_supported"),
        aggregate(transform(col("ts"),
          t => t.getField("share_t") * t.getField("nd")),
          lit(0.0), (a: Column, x: Column) => a + x).as("share_t_wsum"))
    folded.crossJoin(broadcast(tot))
      .select(
        col("nt").cast("long").as("n_treated"),
        col("nc").cast("long").as("n_control"),
        col("n_unsupported"),
        round((col("st").cast("double") / col("nt").cast("double")
          - col("sc").cast("double") / col("nc").cast("double")) / 100.0, 4)
          .as("ate_naive"),
        round(col("sum_w_gap") / col("n_supported") / 100.0, 4)
          .as("ate_adjusted"),
        round((col("st").cast("double") / col("nt").cast("double")
          - col("sc").cast("double") / col("nc").cast("double")) / 100.0
          - col("sum_w_gap") / col("n_supported") / 100.0, 4)
          .as("confounding"),
        round(col("share_t_wsum") / col("n_supported"), 6)
          .as("avg_share_treated"))
  }

  /** q199: activity-stratified effect of the parity pseudo-treatment on
    * post-cutoff spend — the q180 outcome, deconfounded from the q189
    * activity score by its own decile strata.
    */
  def ateQuery(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-16").cast("timestamp")
    val units = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cutoff, 1L)), lit(0L)).as("score"),
        coalesce(sum(when(col("ts") >= cutoff,
          round(col("value") * 100).cast("long"))), lit(0L)).as("cents"))
      .select(col("user_id").as("unit_id"), col("score"),
        (col("user_id") % 2L === 1L).as("treated"), col("cents"))
    estimate(units)
  }
}
