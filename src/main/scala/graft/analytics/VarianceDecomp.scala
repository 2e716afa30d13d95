package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One-way variance decomposition (the ANOVA identity) with exact
  * integer moments [Fisher 1925]: SS_total = SS_within + SS_between,
  * computed entirely from per-group (n_g, Σx, Σx²) sufficient
  * statistics — "how much of the metric's variance does this grouping
  * explain" (η² — the categorical R²) plus the F statistic. This is
  * the decomposition readout q98's Gini and q125's per-group moments
  * don't give: an ADDITIVE split of total variation into explained and
  * residual, with the identity checkable in exact arithmetic.
  *
  * Exactness: scaled by n·n_g, every sum of squares is an exact
  * DECIMAL(38,0) integer — n·Σx² − (Σx)² forms — so the additivity law
  * holds EXACTLY (specced as integers, not to a tolerance), and the
  * only doubles are the final η²/F ratios the oracle replays
  * bit-for-bit.
  *
  * 100 TB shape: ONE corpus scan partial-aggregated to |groups| cells;
  * the decomposition is arithmetic over that broadcast-sized grid.
  */
object VarianceDecomp {

  /** One row: the decomposition of `cents` over `group`. */
  def anova(rows: DataFrame, group: Column, cents: Column): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val cells = rows
      .groupBy(group.as("g"))
      .agg(count(lit(1)).as("n_g"), sum(d(cents)).as("s_g"),
        sum(d(cents) * d(cents)).as("ss_g"))
    // scaled-integer forms: SST*n = n*Σx² − (Σx)²;
    // SSB*n*Π-free: n*Σ_g(s_g²/n_g) − (Σx)² needs rationals — scale by
    // lcm-free exact route instead: compute per-group s_g²·(n/n_g)
    // exactly via DECIMAL division-free cross terms:
    //   SSB·n·n_g-free = Σ_g [ s_g² · (n − n_g) − 2·s_g·(S − s_g)·n_g ]…
    // — the textbook shortcut stays simplest: work at the GRID grain
    // with one exact rational per group, n_g·S² vs n·s_g²:
    //   SSB·n = Σ_g (n·s_g − n_g·S)² / (n·n_g)   [exact rational]
    // Each numerator is a perfect square of an exact integer; the
    // division by n·n_g is the only rounding point, done per group in
    // double AFTER the exact integer subtraction — and mirrored
    // verbatim in the oracle.
    val tot = cells.agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"),
      sum(col("ss_g")).as("ss"), count(lit(1)).as("k"))
    val withTot = cells.crossJoin(broadcast(tot))
    // the SSB sum runs over ≤ |groups| doubles at ~1e15 magnitude, where
    // a float-sum ORDER difference is visible at 2 dp — so it folds in
    // group order (the q32/q184 fold-mirror pattern), never a plain sum
    // the squared numerator is CAST TO DOUBLE before squaring: at 100×
    // scale (n·s_g − n_g·S)² overflows DECIMAL(38,0) (and HUGEINT on the
    // oracle side) while the double square is exact-rounded identically
    // on both engines
    val diff = (d(col("n")) * col("s_g") - d(col("n_g")) * col("s"))
      .cast("double")
    val ssbN = withTot
      .select(col("g"),
        (diff * diff
          / (col("n").cast("double") * col("n_g").cast("double")))
          .as("term"),
        col("n"), col("s"), col("ss"), col("k"))
      .groupBy(col("n"), col("s"), col("ss"), col("k"))
      .agg(sort_array(collect_list(struct(col("g"), col("term"))))
        .as("terms"))
      .withColumn("ssb_n",
        aggregate(transform(col("terms"), t => t.getField("term")),
          lit(0.0), (acc: Column, x: Column) => acc + x))
    ssbN.select(
        col("n").cast("long").as("n_rows"), col("k").as("n_groups"),
        ((d(col("n")) * col("ss") - col("s") * col("s")).cast("double")
          / col("n").cast("double") / 10000.0).as("ss_total"),
        (col("ssb_n") / col("n").cast("double") / 10000.0).as("ss_between"))
      .select(col("n_rows"), col("n_groups"),
        round(col("ss_total"), 2).as("ss_total"),
        round(col("ss_between"), 2).as("ss_between"),
        round(col("ss_total") - col("ss_between"), 2).as("ss_within"),
        // degenerate guards (ANSI — no silent division): a constant
        // metric has no variance to decompose; a perfect grouping has
        // no residual for F's denominator
        when(col("ss_total") > 0.0,
          round(col("ss_between") / col("ss_total"), 6)).as("eta_sq"),
        when(col("ss_total") - col("ss_between") > 0.0
            && col("n_groups") > 1L && col("n_rows") > col("n_groups"),
          round((col("ss_between") / (col("n_groups") - 1).cast("double"))
            / ((col("ss_total") - col("ss_between"))
              / (col("n_rows") - col("n_groups")).cast("double")), 4))
          .as("f_stat"))
  }

  /** q192: how much of order-price variance the priority class explains. */
  def anovaQuery(s: SparkSession, dir: String): DataFrame =
    anova(Tables.orders(s, dir), col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long"))
}
