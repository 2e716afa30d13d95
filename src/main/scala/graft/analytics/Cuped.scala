package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** CUPED variance-reduced experiment readout [Deng, Xu, Kohavi & Walker,
  * "Improving the Sensitivity of Online Controlled Experiments by
  * Utilizing Pre-Experiment Data", WSDM 2013]: the covariance-adjusted
  * metric Y' = Y − θ(X − X̄), with X the user's PRE-period value and
  * θ = cov(X, Y)/var(X), removes the between-user variance the
  * pre-period already explains — the standard way large platforms make
  * A/B readouts k× more sensitive without more traffic.
  *
  * Determinism discipline (the q150 pattern): per-user pre/post totals
  * are EXACT INTEGER CENTS, the pooled moment sums (Σx, Σy, Σxy, Σx²,
  * Σy²) are exact DECIMAL(38,0) arithmetic, and doubles appear only in
  * the final θ/mean ratios — so the oracle's HUGEINT replay hits the
  * same doubles bit-for-bit instead of chasing float-sum order.
  *
  * Scale shape: ONE events scan → per-user conditional aggregate
  * (user-keyed exchange), then a 1-row pooled-moment aggregate and a
  * 2-row per-arm aggregate over the USER table, both broadcast back.
  * Nothing after the first aggregate is corpus-scale.
  */
object Cuped {

  /** q180: per-arm CUPED readout of the events corpus — arms by user-id
    * parity, pre-period before `cutoff`, value in cents.
    */
  def cupedQuery(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-16").cast("timestamp")
    val cents = round(col("value") * 100).cast("long")
    val users = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cutoff, cents)), lit(0L)).as("x"),
        coalesce(sum(when(col("ts") >= cutoff, cents)), lit(0L)).as("y"))
      .select(col("user_id"), (col("user_id") % 2).as("arm"),
        col("x"), col("y"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    val pooled = users.agg(
        count(lit(1)).as("n"),
        sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(d(col("x")) * d(col("y"))).as("sxy"),
        sum(d(col("y")) * d(col("y"))).as("syy"))
      .select(col("n"), col("sx"), col("sy"),
        (d(col("n")) * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("cov_n"),
        (d(col("n")) * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("varx_n"),
        (d(col("n")) * col("syy") - col("sy") * col("sy"))
          .cast("double").as("vary_n"))
      .select(col("n"), col("sx").cast("double").as("sxd"),
        when(col("varx_n") === 0.0, lit(0.0))
          .otherwise(col("cov_n") / col("varx_n")).as("theta"),
        when(col("varx_n") === 0.0 || col("vary_n") === 0.0, lit(0.0))
          .otherwise(col("cov_n") * col("cov_n")
            / (col("varx_n") * col("vary_n"))).as("rho2"))
    users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(d(col("x"))).as("sxa"), sum(d(col("y"))).as("sya"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("n_users"),
        round(col("sya").cast("double") / col("n_users") / 100.0, 4)
          .as("mean_post"),
        round((col("sya").cast("double") / col("n_users")
          - col("theta") * (col("sxa").cast("double") / col("n_users")
            - col("sxd") / col("n"))) / 100.0, 4).as("mean_adjusted"),
        round(col("theta"), 6).as("theta"),
        round(col("rho2"), 6).as("rho2"))
      .orderBy(col("arm"))
  }
}
