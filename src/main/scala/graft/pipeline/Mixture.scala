package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Temperature-weighted data-mixture planner [Raffel et al.,
  * arXiv:1910.10683 §3.4.2 "examples-proportional mixing with temperature";
  * the same α-scaling used for multilingual sampling in Conneau et al.,
  * "Unsupervised Cross-lingual Representation Learning at Scale",
  * arXiv:1911.02116 §3]: given per-source token counts c_i, sample source i
  * with probability w_i ∝ c_i^α (α < 1 up-weights small sources), then turn
  * a global token budget into per-source target token counts and epoch
  * (repeat) factors. This is the planning step that decides HOW MUCH of
  * each corpus a training run consumes.
  *
  * Reference tie: the reference's per-category rollups
  * (`unified_data_analytics.py`'s groupBy over business categories) are the
  * same shape — a per-group resource summary — applied here to the corpus
  * mixing decision.
  *
  * 100 TB shape: the only exchange is the partial-aggregated rollup on the
  * source key; the totals needed for normalization ride a broadcast
  * cross-join of the 1-row global aggregate (never a global window). The
  * plan table itself is dimension-sized (one row per source). Weight is
  * rounded to 6 decimals BEFORE the budget multiply so the DuckDB oracle
  * reproduces the floor() boundary exactly.
  */
object Mixture {

  /** @param alpha  sampling temperature (α=1 ⇒ proportional, α→0 ⇒ uniform).
    * @param budgetFraction global token budget as a fraction of the corpus
    *                       total (keeps the query scale-free across SFs).
    */
  def mixturePlan(docs: DataFrame, alpha: Double,
                  budgetFraction: Double): DataFrame = {
    val perSource = docs
      .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .withColumn("w_raw", pow(col("n_tokens").cast("double"), alpha))
    val totals = perSource.agg(
      sum(col("w_raw")).as("w_total"),
      sum(col("n_tokens")).as("corpus_tokens"))
    perSource
      .crossJoin(broadcast(totals))
      .withColumn("weight", round(col("w_raw") / col("w_total"), 6))
      .withColumn("target_tokens",
        floor(col("weight") * round(col("corpus_tokens") * budgetFraction))
          .cast("long"))
      .withColumn("epochs",
        round(col("target_tokens").cast("double") / col("n_tokens"), 4))
      .select("source", "n_docs", "n_tokens", "weight", "target_tokens", "epochs")
      .orderBy(col("source"))
  }

  def mixturePlanQuery(s: SparkSession, dir: String): DataFrame =
    mixturePlan(Tables.documents(s, dir), alpha = 0.7, budgetFraction = 0.5)
}
