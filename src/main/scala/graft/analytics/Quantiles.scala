package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact global order statistics WITHOUT a global sort — the bucket-offset
  * construction (the q98 Gini / q100 packing pattern, applied to quantile
  * selection): histogram the value space into fixed-width buckets, prefix-
  * sum the dimension-sized histogram to locate the bucket holding each
  * target rank, then sort ONLY the selected buckets' rows. Complements
  * q35's `percentile` (exact but per-group full-sort semantics) and q31's
  * `approx_percentile`: exact answers at corpus scale with two narrow
  * passes and no partition ever holding more than one bucket's rows.
  *
  * Reference tie: the reference's dashboard percentile rollups
  * (README.md's analytics layer) — re-expressed so the exactness survives
  * a 100 TB table.
  *
  * 100 TB shape: pass 1 partial-aggregates bucket counts map-side (the
  * exchange carries one row per bucket); the histogram prefix-sum window
  * runs on the dimension-sized bucket table (≤ range/width rows — the
  * documented tiny-table window exception); pass 2 scans only the buckets
  * that contain a target rank (a broadcast semi-join prune) and ranks
  * within them. Rank arithmetic (`ceil(q·n)`) happens on bit-identical
  * doubles in both engines, so the selected index is exact — no rounding
  * anywhere in the answer path.
  */
object Quantiles {

  /** Nearest-rank quantiles of `valueCol`: value with 1-based rank
    * ceil(q·n) in sorted order. Returns (q, value) rows.
    */
  def globalQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                      bucketWidth: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed = df.select(
      col(valueCol).cast("double").as("v"),
      floor(col(valueCol) / bucketWidth).cast("long").as("b"))
    val hist = bucketed.groupBy(col("b")).agg(count(lit(1)).as("c"))
    // dimension-sized prefix table: one row per occupied bucket
    val pref = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(
        Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val total = hist.agg(sum(col("c")).as("n"))
    val targets = qs.toDF("q")
      .crossJoin(broadcast(total))
      .withColumn("k", ceil(col("q") * col("n")))
    val sel = targets.join(broadcast(pref),
        col("k") > col("cum_before") && col("k") <= col("cum_before") + col("c"))
      .select(col("q"), col("k"), col("b"), col("cum_before"))
    bucketed
      .join(broadcast(sel), Seq("b"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("q")).orderBy(col("v"))))
      .filter(col("rn") === col("k") - col("cum_before"))
      .select(col("q"), col("v").as("value"))
      .orderBy(col("q"))
  }

  def priceQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    globalQuantiles(Tables.lineitem(s, dir), "l_extendedprice",
      Seq(0.25, 0.5, 0.75, 0.9, 0.99), bucketWidth = 1024.0)

  /** Per-group nearest-rank quantiles — the grouped form dashboards ask
    * for ("p50/p90 spend per priority"), same two-pass bucket-offset shape
    * as [[globalQuantiles]]: the histogram carries one row per
    * (group, occupied bucket); its prefix window partitions by GROUP (so
    * no global sort even on the tiny table); pass 2 ranks only the
    * (group, bucket) slices that hold a target rank. No per-group full
    * sort ever happens — the q35 `percentile` semantics at corpus scale.
    */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       qs: Seq[Double], bucketWidth: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed = df.select(
      col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"),
      floor(col(valueCol) / bucketWidth).cast("long").as("b"))
    val hist = bucketed.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    val pref = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(
        Window.partitionBy(col("g")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = hist.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val targets = totals.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("k", ceil(col("q") * col("n")))
    val sel = targets.as("t").join(pref.as("p"),
        col("t.g") === col("p.g") &&
          col("k") > col("cum_before") && col("k") <= col("cum_before") + col("c"))
      .select(col("t.g").as("g"), col("q"), col("k"), col("b"), col("cum_before"))
    bucketed
      .join(broadcast(sel), Seq("g", "b"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("g"), col("q")).orderBy(col("v"))))
      .filter(col("rn") === col("k") - col("cum_before"))
      .select(col("g").as(groupCol), col("q"), col("v").as("value"))
      .orderBy(col(groupCol), col("q"))
  }

  /** q130: spend quantiles per order priority. */
  def priorityQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    groupedQuantiles(Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
      Seq(0.25, 0.5, 0.75, 0.9), bucketWidth = 1024.0)
}
