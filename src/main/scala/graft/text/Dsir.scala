package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.Quantiles

/** DSIR-style importance weighting for data selection [Xie et al., "Data
  * Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169]: score every RAW-pool document by the log-likelihood
  * ratio of its unigram bag under a TARGET-corpus model vs the RAW-pool
  * model, then keep the top quantile by weight — the standard "select
  * web data that looks like the trusted corpus" pass every pretraining
  * pipeline runs between quality rules and dedup. Unigram features stand
  * in for the paper's hashed n-grams (our vocabulary fits without the
  * hashing trick; the estimator is identical).
  *
  * Both bag models use Laplace (+1) smoothing over the shared df-floored
  * vocabulary, so the ratio is defined for every in-vocabulary token;
  * out-of-vocabulary tokens contribute nothing (the q114 treatment).
  * Weights round to 6 decimals AFTER the per-doc sum (the engine's fp
  * discipline) so the DuckDB oracle reproduces the selection threshold
  * bit-for-bit.
  *
  * Reference tie: the reference's ML-feature routing surface
  * (/root/reference/README.md:321-336) — the "which rows feed the model"
  * decision, re-expressed as a distributed corpus operator.
  *
  * 100 TB shape: the model is VOCABULARY-sized, so scoring joins exploded
  * raw tokens to it on the token key — a keyed shuffle, never a broadcast
  * (the q114/q123 discipline); only the 1-row totals and vocab size ride
  * broadcasts. The selection threshold is the engine's own bucket-offset
  * exact quantile ([[graft.analytics.Quantiles.globalQuantiles]]) — no
  * global sort, no corpus-sized window anywhere.
  */
object Dsir {

  /** Per-raw-doc importance weights + top-(1−q) selection.
    *
    * @param targetPred marks the TARGET corpus rows; everything else is
    *                   the raw pool to be scored
    * @param minDf      shared-vocabulary floor (distinct docs, whole corpus)
    * @param keepQuantile selection cut: keep weight ≥ the exact
    *                   nearest-rank `keepQuantile` weight (ties keep)
    */
  def importanceWeights(docs: DataFrame, targetPred: Column, minDf: Int,
                        keepQuantile: Double): DataFrame = {
    val tk = docs.select(col("doc_id"), targetPred.as("is_target"),
      TextOps.tokens(col("text")).as("toks"))
    val tok = tk.select(col("doc_id"), col("is_target"),
      explode(col("toks")).as("token"))

    // ONE aggregation over the exploded corpus carries BOTH the df floor
    // and the per-pool counts (fused — a separate vocab pass would scan
    // and shuffle the corpus twice and pay a join to reunite them);
    // totals and |V| are 1-row aggregates (legitimately broadcast)
    val counts = tok.groupBy(col("token"))
      .agg(
        countDistinct(col("doc_id")).as("df"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("cr"))
      .filter(col("df") >= minDf)
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val vocabSize = counts.agg(count(lit(1)).as("v"))
    val model = counts
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocabSize))
      .select(col("token"),
        log(((col("ct") + 1.0) / (col("nt") + col("v")))
          / ((col("cr") + 1.0) / (col("nr") + col("v")))).as("llr"))

    // score the raw pool: token-keyed join against the vocabulary-sized
    // model (never broadcast), one per-doc partial aggregation
    val scored = tok.filter(!col("is_target"))
      .select(col("doc_id"), col("token"))
      .join(model, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("llr")), 6).as("w"))

    // every raw doc scores — an all-OOV doc carries weight 0 (prior-only).
    // Checkpointed: the threshold subquery below consumes weights a
    // SECOND time, and without the cut the whole tokenize→model→score
    // chain (the corpus-scale work) sat duplicated under both consumers
    // (212 Exchange nodes in the un-cut plan).
    val weights = tk.filter(!col("is_target"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("weight", coalesce(col("w"), lit(0.0)))
      .select(col("doc_id"), col("n_tokens"), col("weight"))
      .localCheckpoint()

    // exact nearest-rank threshold through the bucket-offset selector —
    // weights are small log sums, so a 0.25-wide histogram is plenty
    val thr = Quantiles.globalQuantiles(weights, "weight",
        Seq(keepQuantile), bucketWidth = 0.25)
      .select(col("value").as("thr"))
    weights
      .crossJoin(broadcast(thr))
      .withColumn("selected", col("weight") >= col("thr"))
      .drop("thr")
      .orderBy(col("doc_id"))
  }

  /** q131: score the non-English pool against the English target. */
  def dsirWeightsQuery(s: SparkSession, dir: String): DataFrame =
    importanceWeights(Tables.documents(s, dir), col("lang") === "en",
      minDf = 5, keepQuantile = 0.8)
}
