package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-touch attribution with time-decay credit — the marketing-
  * science tier above the q59/q147 single-join attribution: instead of
  * pairing a conversion with every preceding impression, each click
  * DISTRIBUTES one unit of credit across its in-horizon views,
  * weighted by recency, and each view accumulates credit across the
  * clicks it influenced (the "time-decay model" of standard MTA
  * practice; cf. Shapley-value attribution literature, e.g. Dalessandro
  * et al., "Causally motivated attribution for online advertising",
  * ADKDD'12 — this is its deterministic recency-weighted baseline).
  *
  * Weights are INTEGER on purpose: raw = horizon_µs − age_µs (linear
  * decay, newest view heaviest), so the per-click share is a division
  * of identical integers on both engines and round(·, 6) is
  * boundary-stable — a pow()-based exponential decay would hang the
  * oracle on libm last-ulp differences. Views at exactly the horizon
  * carry raw = 0 and are excluded (zero credit, and they would
  * otherwise put 0/0 in a single-view click).
  *
  * Scale shape: the pair join is the q59 per-user time join (bounded
  * by the horizon; RangeJoin bucketing is the named path when both
  * sides are dense per key), then two keyed aggregates — per-click
  * normalization, per-view accumulation. No window over the corpus.
  */
object Attribution {

  /** Per-view credit rows: (user_id, imp_id, n_clicks, credit), top
    * `topN` by (credit desc, imp_id).
    */
  def timeDecayCredit(views: DataFrame, clicks: DataFrame,
                      horizonUs: Long, topN: Int): DataFrame = {
    val pairs = views.join(clicks, Seq("user_id"))
      .filter(col("click_ts") >= col("imp_ts")
        && unix_micros(col("click_ts")) - unix_micros(col("imp_ts"))
          <= horizonUs)
      .withColumn("raw",
        lit(horizonUs) - (unix_micros(col("click_ts"))
          - unix_micros(col("imp_ts"))))
      .filter(col("raw") > 0)
    val perClick = pairs.groupBy(col("click_id"))
      .agg(sum(col("raw")).as("sum_raw"))
    pairs.join(perClick, Seq("click_id"))
      .withColumn("share", round(col("raw") / col("sum_raw"), 6))
      .groupBy(col("user_id"), col("imp_id"))
      .agg(count(lit(1)).as("n_clicks"),
        round(sum(col("share")), 6).as("credit"))
      .orderBy(col("credit").desc, col("imp_id"))
      .limit(topN)
  }

  /** q150: views credited by clicks over a 1-hour horizon, top 50. */
  def timeDecayQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id"),
        col("ts").as("imp_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    timeDecayCredit(views, clicks, horizonUs = 3600L * 1000000L, topN = 50)
  }
}
