package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Isotonic calibration [Ayer et al. 1955; Zadrozny & Elkan 2002 made
  * it the standard classifier-calibration step]: fit the best
  * NON-DECREASING conversion-rate curve over score bins — the model
  * says "higher score means likelier", the calibrator makes the
  * observed rates honor it with no parametric shape. Instead of the
  * sequential PAVA pooling loop, the fit uses the CLOSED-FORM minimax
  * identity fitted(k) = max_{i≤k} min_{j≥k} avg(i..j) — exactly the
  * PAVA solution [Robertson–Wright–Dykstra, ch. 1], but expressed as
  * joins over the bin grid, so both engines compute the identical
  * arithmetic with no iteration to replay.
  *
  * Exactness: interval averages are single exact-integer divisions
  * (prefix-summed conversions/counts); min/max over identical double
  * sets are order-free; the conservation law Σ fitted·n = Σ conv
  * (isotonic preserves the total — pool averages don't move mass) is
  * specced along with monotonicity and brute-force PAVA parity.
  *
  * 100 TB shape: ONE corpus exchange to the ≤ |bins| cell grid; the
  * O(bins³) minimax grid is metadata-sized (10 bins → ≤ 550 rows) and
  * its windows are the documented dimension-sized exception.
  */
object Isotonic {

  /** Fitted non-decreasing rates over `cells` (bin LONG, n LONG,
    * conv LONG; bins with n = 0 must be absent).
    */
  def fit(cells: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = cells
      .withColumn("pn", sum(col("n")).over(w))
      .withColumn("pc", sum(col("conv")).over(w))
      .select(col("bin"), col("n"), col("conv"), col("pn"), col("pc"))
    val lo = pref.select(col("bin").as("i"),
      (col("pn") - col("n")).as("pn_lo"), (col("pc") - col("conv")).as("pc_lo"))
    val hi = pref.select(col("bin").as("j"),
      col("pn").as("pn_hi"), col("pc").as("pc_hi"))
    // the range joins are over the ≤|bins| grid — BROADCAST them
    // explicitly, or Spark's size-blind planner falls back to a
    // CartesianProduct (the global PlanSpec ban)
    val intervals = lo.join(broadcast(hi), col("i") <= col("j"))
      .select(col("i"), col("j"),
        ((col("pc_hi") - col("pc_lo")).cast("double")
          / (col("pn_hi") - col("pn_lo")).cast("double")).as("a"))
    val fitted = pref.select(col("bin"))
      .join(broadcast(intervals),
        col("i") <= col("bin") && col("bin") <= col("j"))
      .groupBy(col("bin"), col("i")).agg(min(col("a")).as("inner"))
      .groupBy(col("bin")).agg(max(col("inner")).as("fitted"))
    cells.join(fitted, Seq("bin"))
      .select(col("bin"), col("n"), col("conv"),
        round(col("conv").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        round(col("fitted"), 6).as("fitted"))
      .orderBy(col("bin"))
  }

  /** q194: calibrate purchase-conversion against the q189 activity
    * score over its own equi-depth decile cut (scale-stable bins —
    * a raw-count bin saturates as per-user activity grows with the
    * corpus). bin = 10 − decile, so higher bin = higher score and the
    * expected calibration direction is non-decreasing.
    */
  def isotonicQuery(s: SparkSession, dir: String): DataFrame =
    fit(Uplift.withDeciles(Uplift.eventUnits(Tables.events(s, dir)))
      .groupBy((lit(10L) - col("decile")).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("conv")))
}
