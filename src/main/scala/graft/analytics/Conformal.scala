package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Split-conformal prediction intervals [Vovk et al., "Algorithmic
  * Learning in a Random World", 2005; Lei et al., JASA 2018]: fit on a
  * TRAIN split, take q̂ = the ⌈(n+1)(1−α)⌉-th smallest absolute
  * residual on a disjoint CALIBRATION split, and [ŷ ± q̂] then covers a
  * fresh point with probability ≥ 1−α — distribution-free, no model
  * trust required. The readout reports the empirical coverage on a
  * third TEST split, which is the whole point of the guarantee.
  *
  * Determinism discipline: the OLS fit comes from exact DECIMAL(38,0)
  * moment sums over integer cents/days (the q180 pattern — doubles only
  * at the final ratios), and q̂ is an exact ORDER STATISTIC, not an
  * interpolated percentile.
  *
  * Scale shape — the k-th smallest of a corpus-scale residual set
  * WITHOUT a global sort (the q169 prefix-sum discipline): residuals
  * hash-aggregate into $100 buckets (dimension-sized), a prefix sum
  * over the bucket table locates the bucket containing rank k, and only
  * THAT bucket's rows are sorted (TakeOrdered, k_in-bounded). The
  * oracle extracts the same rank via a global row_number — two
  * mechanisms, one value.
  */
object Conformal {

  /** q181: 90% split-conformal interval for order totalprice against
    * days-since-1992, splits by o_orderkey mod 3 (0 train / 1 cal /
    * 2 test). One row: fit, q̂, and the empirical test coverage.
    */
  def conformalQuery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
        (col("o_orderkey") % 3).as("split"),
        datediff(to_date(col("o_orderdate")),
          lit("1992-01-01").cast("date")).cast("long").as("x"),
        round(col("o_totalprice") * 100).cast("long").as("y"))
      .localCheckpoint() // one orders scan feeds all three splits
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    // exact-moment OLS on the train split (map-side-combined sums)
    val fit = o.filter(col("split") === 0L)
      .agg(count(lit(1)).as("n_train"),
        sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(d(col("x")) * d(col("y"))).as("sxy"))
      .select(col("n_train"),
        ((d(col("n_train")) * col("sxy") - col("sx") * col("sy"))
          .cast("double")
          / (d(col("n_train")) * col("sxx") - col("sx") * col("sx"))
            .cast("double")).as("b"),
        col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"))
      .select(col("n_train"), col("b"),
        ((col("syd") - col("b") * col("sxd")) / col("n_train")).as("a"))
    val res = (split: Long) => o.filter(col("split") === split)
      .crossJoin(broadcast(fit.select(col("a"), col("b"))))
      .select(abs(col("y").cast("double")
        - (col("a") + col("b") * col("x").cast("double"))).as("r"))
    val cal = res(1L).localCheckpoint()
    val nCal = cal.count()
    require(nCal > 0, "conformal: empty calibration split")
    val k = math.ceil((nCal + 1L) * 0.9).toLong
    require(k <= nCal, s"conformal: rank $k exceeds calibration size $nCal")
    // bucketed exact order statistic: locate rank k's $100 bucket via a
    // prefix sum over the bucket table, then TakeOrdered inside it
    val buckets = cal.groupBy(floor(col("r") / 10000.0).cast("long")
        .as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt"))
        .over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hit = buckets.filter(col("cum") >= k)
      .orderBy(col("bucket")).limit(1)
      .select(col("bucket"), (col("cum") - col("cnt")).as("before"))
      .collect()(0) // 1-row: the target bucket id + its rank offset
    val qHat = cal
      .filter(floor(col("r") / 10000.0).cast("long") === hit.getLong(0))
      .orderBy(col("r")).limit((k - hit.getLong(1)).toInt)
      .agg(max(col("r")).as("q_hat"))
    val cov = res(2L).crossJoin(broadcast(qHat))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q_hat"), 1L).otherwise(0L)).as("n_in"),
        first(col("q_hat")).as("q_hat"))
    fit.crossJoin(broadcast(cov))
      .select(col("n_train"), lit(nCal).as("n_cal"), col("n_test"),
        round(col("b"), 6).as("slope_cents_per_day"),
        round(col("a") / 100.0, 4).as("intercept"),
        round(col("q_hat") / 100.0, 4).as("q_hat"),
        round(col("n_in").cast("double") / col("n_test"), 4)
          .as("coverage"))
  }
}
