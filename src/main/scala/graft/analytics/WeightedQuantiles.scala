package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Grouped WEIGHTED quantiles — the missing axis of the quantile suite
  * (q116 global, q130 grouped, q143 mergeable sketch): the weighted
  * nearest-rank statistic v_q = min{v : cumW(v) ≥ ⌈q·W⌉}, the form
  * importance-weighted corpus statistics need (a document counted by
  * its token weight, a line item by its quantity — q131's DSIR weights
  * feed exactly this).
  *
  * Exactness discipline: EVERYTHING is integer — weights, cumulative
  * weights, and the threshold ⌈q·W⌉ computed as (num·W + den − 1) DIV
  * den for rational q = num/den; the selected values are reported in
  * raw integer cents. Zero doubles anywhere in the output.
  *
  * 100 TB shape: ONE corpus exchange to the (group, value) grain;
  * cumulative weights ride the q181/q196 bucket discipline — a
  * (group, $100-bucket)-partitioned window (skew-bounded) plus a
  * group-keyed prefix over the dimension-sized bucket table; each
  * quantile is then a conditional min over the grain (no sort, no
  * TakeOrdered, no per-group global window). The oracle ranks via a
  * plain per-group window — two mechanisms, one statistic.
  */
object WeightedQuantiles {

  /** One row per group: total weight and the weighted nearest-rank
    * values (integer cents) at the num/den quantiles given.
    */
  def grouped(rows: DataFrame, group: Column, cents: Column,
      weight: Column, quantiles: Seq[(Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty &&
      quantiles.forall { case (n, d) => n > 0 && n <= d },
      s"quantiles must be rationals in (0, 1]: $quantiles")
    val grain = rows
      .select(group.as("g"), cents.as("v"), weight.as("w"))
      .groupBy(col("g"), col("v"))
      .agg(sum(col("w")).as("w"))
      .withColumn("bucket", expr("v DIV 10000"))
    val wIn = Window.partitionBy(col("g"), col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = grain.withColumn("cum_in", sum(col("w")).over(wIn))
    val buckets = grain.groupBy(col("g"), col("bucket"))
      .agg(sum(col("w")).as("b_w"))
      .withColumn("b_before",
        coalesce(sum(col("b_w")).over(
          Window.partitionBy(col("g")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("g"), col("bucket"), col("b_before"))
    val totals = grain.groupBy(col("g")).agg(sum(col("w")).as("w_total"))
    val ranked = inBucket.join(buckets, Seq("g", "bucket"))
      .withColumn("cumw", col("b_before") + col("cum_in"))
      .join(totals, Seq("g"))
    val qCols = quantiles.map { case (num, den) =>
      // v_q = min{v : cumw >= ceil(num/den * W)}, all integer
      min(when(col("cumw") >=
        expr(s"CAST(($num * w_total + ${den - 1}) DIV $den AS BIGINT)"),
        col("v"))).as(s"p${num}_${den}_cents")
    }
    ranked.groupBy(col("g"), col("w_total"))
      .agg(qCols.head, qCols.tail: _*)
      .orderBy(col("g"))
  }

  /** q201: quantity-weighted price quantiles per return flag — each
    * line item counted by its quantity, the way a revenue analyst
    * weights a price distribution.
    */
  def weightedQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    grouped(Tables.lineitem(s, dir),
      col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long"),
      col("l_quantity").cast("long"),
      quantiles = Seq((1, 4), (1, 2), (3, 4), (9, 10)))
}
