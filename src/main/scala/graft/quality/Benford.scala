package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benford first-digit audit [Benford 1938; Nigrini, "Digital Analysis
  * Using Benford's Law" — the standard forensic-accounting screen]:
  * naturally-grown monetary amounts put digit d first with probability
  * log₁₀(1 + 1/d); fabricated or truncated feeds don't. The audit
  * reports the observed first-digit distribution against Benford's,
  * with a chi-square distance — the data-quality screen that catches
  * GENERATED or clipped value columns q124's constraints and q125's
  * moments both pass.
  *
  * Determinism: the nine expected probabilities are COMPILED CONSTANTS
  * of this object, and the oracle interpolates exactly these doubles
  * (`Double.toString`) rather than calling its own log10 — the one
  * place the engines' libm could disagree. The first digit comes from
  * the integer's decimal string (identical on both engines); the
  * chi-square sum folds in digit order (the q192 discipline).
  *
  * 100 TB shape: ONE corpus scan partial-aggregated to ≤ 9 digit
  * cells; everything after is constant-sized.
  */
object Benford {

  /** log₁₀(1 + 1/d) for d = 1..9, compiled once, shared with the oracle. */
  val Expected: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Digit table + chi-square for positive integer `amount`. */
  def audit(rows: DataFrame, amount: Column): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    val cells = rows
      .select(amount.as("v")).filter(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val expected = Expected.zipWithIndex
      .map { case (p, i) => (i + 1, p) }.toDF("digit", "p_benford")
    val grid = expected.join(cells, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("p_benford"))
    val tot = grid.agg(sum(col("n_obs")).as("n"))
    val terms = grid.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_obs").cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("share") - col("p_benford")) * (col("share") - col("p_benford"))
          / col("p_benford") * col("n").cast("double"))
    // chi2 folds over the 9 digit terms IN DIGIT ORDER (float-sum order
    // would otherwise be engine-dependent)
    val chi2 = terms
      .agg(sort_array(collect_list(struct(col("digit"), col("term"))))
        .as("ts"))
      .select(aggregate(transform(col("ts"), t => t.getField("term")),
        lit(0.0), (a: Column, x: Column) => a + x).as("chi_sq"))
    terms.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"),
        round(col("share"), 6).as("share"),
        round(col("p_benford"), 6).as("p_benford"),
        round(col("share") - col("p_benford"), 6).as("excess"),
        round(col("chi_sq"), 4).as("chi_sq"))
      .orderBy(col("digit"))
  }

  /** q195: Benford audit of order totals in cents. */
  def benfordQuery(s: SparkSession, dir: String): DataFrame =
    audit(Tables.orders(s, dir),
      round(col("o_totalprice") * 100).cast("long"))
}
