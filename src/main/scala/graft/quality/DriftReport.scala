package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-drift report between two dataset snapshots — the
  * monitoring half of data quality (row 2 of every Deequ/Evidently
  * deployment): numeric columns compare mean and population stddev,
  * categorical columns compare total-variation distance; each metric is
  * one verdict row. Complements q104 (row-level snapshot diff): this is
  * the STATISTICAL diff that catches upstream regressions even when every
  * row is new.
  *
  * Reference tie: `Data_Quality.py`'s profiling assertions, extended from
  * point-in-time checks to snapshot-over-snapshot deltas.
  *
  * 100 TB shape: numeric metrics are ONE fused partial-aggregated scan
  * per snapshot (count/sum/sumsq per column); the categorical TVD shuffles
  * only the (value → count) table — category-cardinality sized — through a
  * full outer join. Metrics round to 6 dp before the delta so the oracle
  * reproduces the comparison.
  */
object DriftReport {

  /** (metric, old_value, new_value, abs_delta) for one numeric column. */
  def numericDrift(oldDf: DataFrame, newDf: DataFrame,
                   colName: String): DataFrame = {
    def stats(df: DataFrame, tag: String): DataFrame =
      df.agg(
        count(col(colName)).cast("double").as(s"n_$tag"),
        round(avg(col(colName)), 6).as(s"mean_$tag"),
        round(stddev_pop(col(colName)), 6).as(s"sd_$tag"))
    stats(oldDf, "old").crossJoin(broadcast(stats(newDf, "new")))
      .select(array(
        struct(lit(s"count($colName)").as("metric"),
          col("n_old").as("old_value"), col("n_new").as("new_value")),
        struct(lit(s"mean($colName)").as("metric"),
          col("mean_old").as("old_value"), col("mean_new").as("new_value")),
        struct(lit(s"stddev($colName)").as("metric"),
          col("sd_old").as("old_value"), col("sd_new").as("new_value"))).as("ms"))
      .select(explode(col("ms")).as("m"))
      .select(col("m.metric"), col("m.old_value"), col("m.new_value"),
        round(abs(col("m.new_value") - col("m.old_value")), 6).as("abs_delta"))
  }

  /** Total-variation distance between the two categorical distributions:
    * TVD = ½ Σ_v |p_old(v) − p_new(v)|, one row.
    */
  def categoricalDrift(oldDf: DataFrame, newDf: DataFrame,
                       colName: String): DataFrame = {
    def dist(df: DataFrame, tag: String): DataFrame = {
      val c = df.groupBy(col(colName).as("v"))
        .agg(count(lit(1)).as(s"c_$tag"))
      c.crossJoin(broadcast(
          c.agg(sum(col(s"c_$tag")).as(s"n_$tag"))))
        .select(col("v"),
          (col(s"c_$tag").cast("double") / col(s"n_$tag")).as(s"p_$tag"))
    }
    dist(oldDf, "old")
      .join(dist(newDf, "new"), Seq("v"), "full_outer")
      .select(abs(coalesce(col("p_old"), lit(0.0))
        - coalesce(col("p_new"), lit(0.0))).as("d"))
      .agg(round(sum(col("d")) / 2.0, 6).as("tvd"))
      .select(lit(s"tvd($colName)").as("metric"),
        lit(null).cast("double").as("old_value"),
        lit(null).cast("double").as("new_value"),
        col("tvd").as("abs_delta"))
  }

  /** q125: orders before vs from 1998 — the schema's numeric and
    * categorical drift in one report.
    */
  def ordersDriftQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val cut = lit("1998-01-01").cast("timestamp")
    val oldS = orders.filter(col("o_orderdate") < cut)
    val newS = orders.filter(col("o_orderdate") >= cut)
    numericDrift(oldS, newS, "o_totalprice")
      .unionAll(categoricalDrift(oldS, newS, "o_orderstatus"))
      .unionAll(categoricalDrift(oldS, newS, "o_orderpriority"))
      .orderBy(col("metric"))
  }
}
