package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Difference-in-differences readout [Card & Krueger 1994 popularized
  * the design; Angrist & Pischke, "Mostly Harmless Econometrics", ch. 5]:
  * when treatment wasn't randomized, compare the treated group's
  * pre→post CHANGE against the control group's — the 2×2 estimator
  * δ = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — so any level
  * difference between groups and any common time shock cancel. The
  * readout also reports the PARALLEL-TRENDS pre-check on two
  * pre-period halves (the identifying assumption is a claim about
  * slopes, and an analyst must see it tested, not assumed). Completes
  * the causal suite: q180 (randomized + variance reduction), q189
  * (targeting), q191 (observational panels).
  *
  * Exactness discipline (the q180 pattern): per-cell sums are exact
  * integer cents in DECIMAL(38,0); cell means are one exact-integer
  * division each; δ and the trends gap are fixed-shape double
  * arithmetic over those means — the oracle replays every double
  * bit-for-bit.
  *
  * 100 TB shape: ONE corpus scan partial-aggregated straight to the
  * 2×4 (group, period) cell grid — the smallest exchange in the
  * engine. The output pivot is a 1-row crossJoin of that broadcast
  * grid. No windows, no joins, no second pass.
  */
object DiffInDiff {

  /** 2×2 DiD + parallel-trends pre-check over `panel` rows carrying
    * `treated` BOOLEAN, `period` STRING in
    * {'pre1','pre2','post'} (pre1 earlier half, pre2 later half — both
    * pre-treatment), and integer `cents`. Returns ONE row.
    */
  def estimate(panel: DataFrame): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cells = panel
      .groupBy(col("treated"), col("period"))
      .agg(count(lit(1)).as("n"), sum(d(col("cents"))).as("s"))
      .withColumn("mean", col("s").cast("double") / col("n").cast("double"))
    def m(tr: Boolean, p: String) =
      max(when(col("treated") === tr && col("period") === p, col("mean")))
        .as(s"m_${if (tr) "t" else "c"}_$p")
    val grid = cells.agg(
      m(tr = true, "pre1"), m(tr = true, "pre2"), m(tr = true, "post"),
      m(tr = false, "pre1"), m(tr = false, "pre2"), m(tr = false, "post"),
      sum(col("n")).as("n_rows"))
    grid.select(
      col("n_rows"),
      round((col("m_t_post") - col("m_t_pre2"))
        / 100.0, 4).as("treated_change"),
      round((col("m_c_post") - col("m_c_pre2"))
        / 100.0, 4).as("control_change"),
      round(((col("m_t_post") - col("m_t_pre2"))
        - (col("m_c_post") - col("m_c_pre2"))) / 100.0, 4).as("did"),
      // parallel-trends pre-check: the two groups' pre1->pre2 slopes
      // should match; the gap is the assumption's measured violation
      round(((col("m_t_pre2") - col("m_t_pre1"))
        - (col("m_c_pre2") - col("m_c_pre1"))) / 100.0, 4)
        .as("pretrend_gap"))
  }

  /** q191: DiD of event value under the parity pseudo-treatment with
    * periods pre1 = [Jan 1, Jan 8), pre2 = [Jan 8, Jan 16), post =
    * [Jan 16, ...) — the q180 cutoff with its pre period halved.
    */
  def didQuery(s: SparkSession, dir: String): DataFrame = {
    val t8 = lit("2024-01-08").cast("timestamp")
    val t16 = lit("2024-01-16").cast("timestamp")
    estimate(Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(
        (col("user_id") % 2L === 1L).as("treated"),
        when(col("ts") < t8, "pre1").when(col("ts") < t16, "pre2")
          .otherwise("post").as("period"),
        round(col("value") * 100).cast("long").as("cents")))
  }
}
