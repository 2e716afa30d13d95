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

  /** Population Stability Index over fixed equal-width bins — the
    * industry-standard BINNED drift score the mean/stddev/TVD report
    * cannot replace: PSI = Σ_i (p_i − q_i)·ln(p_i/q_i) over B bins
    * catches shape changes (bimodality, tail migration) that leave the
    * first two moments intact, and its conventional action thresholds
    * (< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted) make it the
    * monitoring gate of scorecard/feature pipelines [the credit-risk
    * monitoring statistic; see e.g. Yurdakul, "Statistical properties
    * of the Population Stability Index", 2018].
    *
    * Construction is oracle-replayable end to end: bins are FIXED
    * equal-width over [lo, hi) with clamp-to-edge (no data-dependent
    * cut points), counts get add-one smoothing so empty bins stay
    * finite, proportions divide exact integers, and the per-bin
    * contribution rounds to 6 dp (the engine-wide libm-ulp discipline —
    * ln differs in the last ulp across engines).
    *
    * 100 TB shape: one partial-aggregated scan per snapshot (the bin id
    * is codegen arithmetic), a B-row broadcast-joined grid so EMPTY bins
    * surface (a vanished mode is exactly the drift you must not drop),
    * and B-row arithmetic after — the exchange carries ≤ B rows per
    * side.
    */
  def psiDrift(base: DataFrame, current: DataFrame, colName: String,
               lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, "need >= 2 bins over a nonempty range")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, tag: String): DataFrame =
      df.select(least(lit(bins - 1), greatest(lit(0),
          floor((col(colName) - lo) / width).cast("int"))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(s"c_$tag"))
    val spark = base.sparkSession
    val grid = spark.range(0, bins).select(col("id").cast("int").as("bin"))
    val joined = grid
      .join(binned(base, "base"), Seq("bin"), "left")
      .join(binned(current, "cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_base"), lit(0L)).as("n_base"),
        coalesce(col("c_cur"), lit(0L)).as("n_cur"))
    // add-one smoothing over the FULL grid: denominators are n + bins
    val tot = joined.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_cur")).as("t_cur"))
    joined.crossJoin(broadcast(tot))
      .withColumn("p",
        (col("n_base") + 1L).cast("double") / (col("t_base") + bins))
      .withColumn("q",
        (col("n_cur") + 1L).cast("double") / (col("t_cur") + bins))
      .select(col("bin"),
        round(lit(lo) + col("bin") * width, 6).as("bin_lo"),
        col("n_base"), col("n_cur"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6)
          .as("psi_contrib"))
      .orderBy(col("bin"))
  }

  /** q156: PSI of the event `value` distribution, first half of the
    * event-id range (the at-training-time baseline stand-in) vs the
    * second (serving window), 20 bins over the value domain [0, 200).
    */
  def psiDriftQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("value"))
    val mid = e.agg((max(col("event_id")) / 2L).as("mid"))
    val tagged = e.crossJoin(broadcast(mid))
    psiDrift(
      tagged.filter(col("event_id") <= col("mid")),
      tagged.filter(col("event_id") > col("mid")),
      "value", lo = 0.0, hi = 200.0, bins = 20)
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
