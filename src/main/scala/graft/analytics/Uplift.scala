package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Score-decile uplift readout with a Qini curve [Radcliffe, "Using
  * Control Groups to Target on Predicted Lift", 2007; the Qini
  * coefficient is the uplift field's ROC]: rank units by a targeting
  * score, cut into ten score-deciles, and per decile compare treated
  * vs control conversion — the incremental-impact readout that tells a
  * growth team WHO to treat, where q180's CUPED tells them whether the
  * average effect is real. Qini(d) = cumConv_T(d) − cumConv_C(d) ·
  * cumN_T(d)/cumN_C(d): the cumulative extra conversions over a
  * control scaled to the treated volume.
  *
  * Exactness discipline: decile assignment is INTEGER — scores
  * aggregate to a score-grain table, the descending cumulative count
  * assigns decile(score) = ⌈10·cum/n⌉ computed as (10·cum + n − 1)
  * div n, so ties share a decile deterministically and the oracle
  * replays the cut exactly (the q169 equi-depth discipline on the
  * score axis). All counts stay integers; doubles appear only in the
  * final rate/uplift/qini expressions, built with the identical
  * operation shape on both engines.
  *
  * 100 TB shape: ONE user-keyed corpus aggregate; the score-grain
  * table is bounded by the score DOMAIN (small integers), its global
  * window is the documented dimension-sized exception; the user →
  * decile attach is an equi-join on score against that broadcastable
  * map; the decile rollup exchanges ≤ 10·2 cells; the qini windows run
  * over 10 rows.
  */
object Uplift {

  /** Per-decile uplift + Qini over `units` (unit_id, score LONG,
    * treated BOOLEAN, converted BOOLEAN). Decile 1 = highest scores.
    */
  /** Attach the integer equi-depth decile (1 = highest scores) to each
    * unit: the score-grain cut rule (10·cum + n − 1) div n, shared by
    * q189 and q194.
    */
  def withDeciles(units: DataFrame): DataFrame = {
    val n = units.agg(count(lit(1)).as("n"))
    val scoreGrain = units.groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("score"),
        // integer ceiling division — `div`, never a double `/` (an exact
        // boundary must not wobble on float rounding)
        expr("CAST((cum * 10 + n - 1) DIV n AS BIGINT)").as("decile"))
    units.join(scoreGrain, Seq("score"))
  }

  def qiniDeciles(units: DataFrame): DataFrame = {
    val cells = withDeciles(units)
      .groupBy(col("decile"))
      .agg(
        sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
        sum(when(col("treated") && col("converted"), 1L).otherwise(0L))
          .as("conv_t"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
        sum(when(!col("treated") && col("converted"), 1L).otherwise(0L))
          .as("conv_c"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_nt", sum(col("n_t")).over(w))
      .withColumn("cum_ct", sum(col("conv_t")).over(w))
      .withColumn("cum_nc", sum(col("n_c")).over(w))
      .withColumn("cum_cc", sum(col("conv_c")).over(w))
      .select(col("decile"), col("n_t"), col("n_c"),
        // an empty arm yields NULL, never a division error (ANSI mode)
        when(col("n_t") > 0L,
          round(col("conv_t").cast("double") / col("n_t").cast("double"), 6))
          .as("rate_treated"),
        when(col("n_c") > 0L,
          round(col("conv_c").cast("double") / col("n_c").cast("double"), 6))
          .as("rate_control"),
        when(col("n_t") > 0L && col("n_c") > 0L,
          round(col("conv_t").cast("double") / col("n_t").cast("double")
            - col("conv_c").cast("double") / col("n_c").cast("double"), 6))
          .as("uplift"),
        when(col("cum_nc") > 0L,
          round(col("cum_ct").cast("double") - col("cum_cc").cast("double")
            * col("cum_nt").cast("double") / col("cum_nc").cast("double"), 4))
          .as("qini"))
      .orderBy(col("decile"))
  }

  /** Units from the events stream: arm by user parity (the q180 split),
    * conversion = any purchase, targeting score = pre-cutoff activity.
    */
  def eventUnits(events: DataFrame): DataFrame = {
    val cutoff = lit("2024-01-16").cast("timestamp")
    events.filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cutoff, 1L)), lit(0L)).as("score"),
        (coalesce(sum(when(col("event_type") === "purchase", 1L)), lit(0L))
          > 0L).as("converted"))
      .select(col("user_id").as("unit_id"), col("score"),
        (col("user_id") % 2L === 1L).as("treated"), col("converted"))
  }

  /** q189: decile uplift + Qini of purchase conversion under the parity
    * pseudo-experiment, targeted by pre-period activity.
    */
  def upliftQuery(s: SparkSession, dir: String): DataFrame =
    qiniDeciles(eventUnits(Tables.events(s, dir)))
}
