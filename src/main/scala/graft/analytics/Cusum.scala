package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CUSUM change-point location [Page 1954; the scaled form is the
  * classic at-most-one-change estimator]: the day where the cumulative
  * deviation from the global mean peaks is the least-squares estimate
  * of a level shift's location — the monitoring readout that answers
  * WHEN a metric moved, where q125/q156 answer WHETHER two snapshots
  * differ and q167 answers WHO moved.
  *
  * Exactness discipline: the CUSUM statistic is kept as the EXACT
  * INTEGER n·S_t = n·cum_t − t_idx·total (clearing the x̄ rational), so
  * the argmax and its tie-break (largest |n·S|, latest day — the
  * struct-max convention, mirrored by the oracle's ORDER BY abs_ns
  * DESC, day DESC) compare integers — no float dust near the peak.
  * Only the reported
  * before/after means divide.
  *
  * 100 TB shape: ONE corpus scan partial-aggregated to the day grid;
  * the prefix window and argmax run over ≤ window-days rows.
  */
object Cusum {

  /** One row: the strongest level-shift candidate of `cents` summed by
    * day — the peak day, the scaled CUSUM magnitude, and the means on
    * each side.
    */
  def changePoint(rows: DataFrame): DataFrame = {
    val days = rows
      .groupBy(col("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("cents").cast("decimal(38,0)")).as("s"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIdx = Window.orderBy(col("day"))
    // totals ride the SAME day-grid window pass as the prefixes (full
    // frame) — a separate aggregate branch would re-scan the corpus
    // (the day grid is derived, not materialized)
    val wAll = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pref = days
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .withColumn("cum_s", sum(col("s")).over(w))
      .withColumn("idx", row_number().over(wIdx))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("total", sum(col("s")).over(wAll))
      .withColumn("n_days", count(lit(1)).over(wAll))
      // n·S_t with S_t = cum_s − cum_cnt·(total/n): exact integers
      .withColumn("ns",
        col("n").cast("decimal(38,0)") * col("cum_s")
          - col("cum_cnt").cast("decimal(38,0)") * col("total"))
      .withColumn("abs_ns", abs(col("ns")))
    // argmax by (|n·S| DESC, day ASC): an exact integer struct-max
    val peak = pref
      .filter(col("idx") < col("n_days")) // a cut needs a non-empty tail
      .agg(max(struct(col("abs_ns").as("m"), col("day").as("dday"),
        col("cum_cnt"), col("cum_s"), col("n"), col("total")))
        .as("p"))
      .select(col("p.*"))
    // NOTE on the tie-break: struct-max on (abs_ns, day) picks the
    // LATEST tied day; the oracle mirrors exactly this convention
    // (ORDER BY abs_ns DESC, day DESC LIMIT 1) — pinned, not assumed.
    peak.select(
      col("dday").as("change_day"),
      col("m").cast("double").as("ns_peak"),
      round(col("cum_s").cast("double") / col("cum_cnt").cast("double")
        / 100.0, 4).as("mean_before"),
      round((col("total") - col("cum_s")).cast("double")
        / (col("n") - col("cum_cnt")).cast("double") / 100.0, 4)
        .as("mean_after"),
      round((col("total") - col("cum_s")).cast("double")
        / (col("n") - col("cum_cnt")).cast("double") / 100.0
        - col("cum_s").cast("double") / col("cum_cnt").cast("double")
        / 100.0, 4).as("shift"))
  }

  /** q198: where did daily event value level-shift? */
  def cusumQuery(s: SparkSession, dir: String): DataFrame =
    changePoint(Tables.events(s, dir)
      .select(col("ts").cast("date").as("day"),
        round(col("value") * 100).cast("long").as("cents")))
}
