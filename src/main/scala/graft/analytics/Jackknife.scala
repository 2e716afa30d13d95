package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Delete-one-block jackknife standard errors for grouped ratio metrics
  * [Quenouille 1956; Tukey 1958; the block form is the production
  * estimator — e.g. Poisson-free uncertainty at terabyte scale where a
  * true bootstrap's B full resamples are unaffordable]. Rows hash into
  * B deterministic buckets; each leave-one-bucket-out estimate
  * θ_(b) = (S − s_b)/(N − n_b) needs only the per-bucket sufficient
  * statistics, so the WHOLE uncertainty readout costs one grouped
  * aggregate over (group, bucket) cells: var_jack = (B−1)/B ·
  * Σ_b (θ_(b) − θ̄)². The complement of q180's CUPED (variance
  * REDUCTION) — this is variance MEASUREMENT for metrics with no
  * closed-form SE.
  *
  * Determinism discipline: per-cell sums are exact integer cents in
  * DECIMAL(38,0); θ_(b) doubles come from one exact-integer division
  * each; the bucket-ordered list folds sum them in a fixed order
  * (the q32/q184 fold-mirror pattern), and sqrt is IEEE
  * correctly-rounded — the oracle replays every double bit-for-bit.
  *
  * 100 TB shape: ONE corpus scan partial-aggregated into (group,
  * bucket) cells — at most |groups|·B rows on the exchange; everything
  * after is a per-group fold over ≤ B elements. No second pass, no
  * resample materialization, no corpus-scale window.
  */
object Jackknife {

  /** Per-group mean + jackknife SE + normal 95% CI. `valueCents` must
    * be an exact integer (long) expression; `bucket` a deterministic
    * int in [0, nBuckets).
    */
  def groupedMeanCi(rows: DataFrame, group: Column, valueCents: Column,
      bucket: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"jackknife needs >= 2 buckets, got $nBuckets")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val cells = rows
      .groupBy(group.as("grp"), bucket.as("b"))
      .agg(count(lit(1)).as("n_b"), sum(d(valueCents)).as("s_b"))
    val byGroup = cells
      .groupBy(col("grp"))
      .agg(
        sum(col("n_b")).as("n"),
        sum(col("s_b")).as("s"),
        count(lit(1)).as("n_buckets"),
        sort_array(collect_list(struct(col("b"), col("n_b"), col("s_b"))))
          .as("cells"))
    // Leave-one-out estimates in bucket order; groups entirely inside a
    // single bucket have no complement to estimate from -> SE 0.
    val thetas = transform(col("cells"), c =>
      (col("s") - c.getField("s_b")).cast("double")
        / (col("n") - c.getField("n_b")).cast("double"))
    val foldSum = (xs: Column) =>
      aggregate(xs, lit(0.0), (acc: Column, x: Column) => acc + x)
    byGroup
      .withColumn("theta", col("s").cast("double") / col("n").cast("double"))
      .withColumn("thetas",
        when(col("n_buckets") >= 2, thetas).otherwise(array()))
      .withColumn("theta_bar",
        when(col("n_buckets") >= 2,
          foldSum(col("thetas")) / col("n_buckets").cast("double"))
          .otherwise(col("theta")))
      .withColumn("se",
        when(col("n_buckets") >= 2,
          sqrt(foldSum(transform(col("thetas"),
            t => (t - col("theta_bar")) * (t - col("theta_bar"))))
            * (col("n_buckets") - 1).cast("double")
            / col("n_buckets").cast("double")))
          .otherwise(lit(0.0)))
      .select(
        col("grp"), col("n").cast("long").as("n_rows"), col("n_buckets"),
        round(col("theta") / 100.0, 4).as("mean_value"),
        round(col("se") / 100.0, 6).as("jack_se"),
        round((col("theta") - lit(1.96) * col("se")) / 100.0, 4).as("ci_lo"),
        round((col("theta") + lit(1.96) * col("se")) / 100.0, 4).as("ci_hi"))
      .orderBy(col("grp"))
  }

  /** q185: mean order price per priority class with jackknife 95% CIs,
    * 32 orderkey-hash buckets.
    */
  def jackknifeQuery(s: SparkSession, dir: String): DataFrame =
    groupedMeanCi(
      Tables.orders(s, dir),
      col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long"),
      pmod(col("o_orderkey"), lit(32)).cast("int"),
      nBuckets = 32)
}
