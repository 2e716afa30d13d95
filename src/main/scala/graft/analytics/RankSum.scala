package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Mann–Whitney U / Wilcoxon rank-sum test [Mann & Whitney 1947]: the
  * nonparametric two-sample comparison — does arm A's value
  * distribution stochastically dominate arm B's — that stays valid
  * under the heavy-tailed, outlier-ridden metrics where the t-test
  * behind q180/q185 loses power. Reports U, the rank-biserial effect
  * size r = 2U/(n_a·n_b) − 1 (the probability-of-superiority scale),
  * and the normal z approximation.
  *
  * Exactness discipline: ranks never touch a global sort. Values
  * hash-aggregate to a VALUE-GRAIN table; each tie group's average
  * rank is cum_before + (cnt+1)/2, kept as the exact INTEGER
  * 2·avgrank; the rank sums are exact DECIMAL(38,0); doubles appear
  * only in z and r. Tie handling is the midrank convention by
  * construction — ties are the value-grain rows themselves. (z uses
  * the untied variance — with the corpus's cent-grain values the tie
  * correction is negligible and its omission is deterministic.)
  *
  * 100 TB shape: one corpus scan to the value grain (the only
  * corpus-keyed exchange); cumulative positions ride the q181
  * bucketed-prefix-sum discipline — a $100-bucket window partitioned
  * BY BUCKET (skew-bounded), plus a bucket-grain global prefix over
  * the dimension-sized bucket table. No corpus-scale window, no sort.
  */
object RankSum {

  /** One row: the two-sample rank-sum readout of `cents` between
    * `isTreated` arms.
    */
  def test(rows: DataFrame, isTreated: org.apache.spark.sql.Column,
      cents: org.apache.spark.sql.Column): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val grain = rows
      .select(cents.as("v"), isTreated.as("t"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("t"), 1L).otherwise(0L)).as("cnt_a"))
      .withColumn("bucket", expr("v DIV 10000"))
    // within-bucket running position (skew-bounded window), then the
    // bucket-grain offsets via a dimension-sized prefix
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = grain
      .withColumn("cum_in", sum(col("cnt")).over(wIn))
    val bucketTot = grain.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("b_cnt"))
      .withColumn("b_before",
        coalesce(sum(col("b_cnt")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("b_before"))
    val ranked = inBucket.join(bucketTot, Seq("bucket"))
      // 2·avgrank = 2·cum_before + cnt + 1, an exact integer
      .withColumn("r2",
        (col("b_before") + col("cum_in") - col("cnt")) * 2L
          + col("cnt") + 1L)
    val agg = ranked.agg(
      sum(d(col("cnt_a")) * d(col("r2"))).as("r2_sum_a"),
      sum(col("cnt_a")).as("n_a"),
      sum(col("cnt") - col("cnt_a")).as("n_b"))
    agg.select(
        col("n_a"), col("n_b"),
        // U_a = R_a − n_a(n_a+1)/2 with R_a = r2_sum_a / 2. Under ties
        // U is a HALF-integer (midranks), so it stays a double — the
        // halved exact integer is exactly representable
        ((col("r2_sum_a") - d(col("n_a")) * (col("n_a") + 1L))
          .cast("double") / 2.0).as("u_a"))
      .select(col("n_a"), col("n_b"), col("u_a"),
        (col("n_a").cast("double") * col("n_b").cast("double")
          - col("u_a")).as("u_b"),
        round(lit(2.0) * col("u_a").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))
          - 1.0, 6).as("rank_biserial"),
        round((col("u_a").cast("double")
          - col("n_a").cast("double") * col("n_b").cast("double") / 2.0)
          / sqrt(col("n_a").cast("double") * col("n_b").cast("double")
            * (col("n_a") + col("n_b") + 1L).cast("double") / 12.0), 4)
          .as("z"))
  }

  /** q196: rank-sum comparison of order totals between orderkey-parity
    * arms.
    */
  def rankSumQuery(s: SparkSession, dir: String): DataFrame =
    test(Tables.orders(s, dir), col("o_orderkey") % 2L === 1L,
      round(col("o_totalprice") * 100).cast("long"))
}
