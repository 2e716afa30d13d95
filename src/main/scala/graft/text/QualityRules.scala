package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Gopher/C4-family document quality-rule gate [Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv:2112.11446 §A1.1; Raffel et al., "Exploring the Limits of Transfer
  * Learning with a Unified Text-to-Text Transformer", arXiv:1910.10683 §2.2]:
  * a fixed battery of per-document heuristic rules (length bounds, mean
  * word length bounds, vocabulary-diversity floor, top-token concentration
  * cap, stopword presence), evaluated in ONE narrow pass and rolled up per
  * source. This is the standard pre-dedup curation tier — cheap rules that
  * kill boilerplate and gibberish before the expensive similarity passes.
  *
  * Reference tie: generalizes the reference's per-record gating
  * (`Business_ETL.py`'s null/category drops) from fixed-schema records to
  * free-text corpus rules.
  *
  * 100 TB shape: every signal — including the top-token concentration,
  * which naively needs a per-(doc, token) shuffle — is computed per-row
  * with higher-order array functions (sort + run-length fold), so the ONLY
  * exchange in the plan is the final partial-aggregated rollup on the
  * source key (dozens of groups). Ratio thresholds compare on round(·, 4)
  * values so the DuckDB oracle reproduces every boundary decision.
  */
object QualityRules {

  val MinTokens       = 20L
  val MaxTokens       = 95L
  val MinAvgTokenLen  = 3.0
  val MaxAvgTokenLen  = 8.0
  val MinDistinctRatio = 0.4
  val MaxTopTokenRatio = 0.2

  /** Union of the per-language marker lists (TextOps.langMarkers): a doc
    * with zero hits in every list reads as no-natural-language.
    */
  val StopMarkers: Seq[String] = TextOps.langMarkers.flatMap(_._2).distinct

  /** Longest run of equal adjacent elements in an ALREADY-SORTED string
    * array — i.e. the count of the most frequent token, without any
    * per-token shuffle. A single codegen'd fold with (prev, run, max) state.
    */
  private def maxRun(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("mx")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"))
      },
      acc => acc.getField("mx"))

  /** Per-document rule flags: (doc_id, source, n_tokens, avg_token_len,
    * distinct_ratio, top_token_ratio, stop_hits, fail_*, pass).
    */
  def qualityFlags(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"), toks.as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("avg_token_len",
        round(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("distinct_ratio",
        round(size(array_distinct(col("toks"))).cast("double")
          / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("top_token_ratio",
        round(maxRun(array_sort(col("toks"))).cast("double")
          / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("stop_hits",
        size(filter(col("toks"), t => t.isin(StopMarkers: _*))).cast("long"))
      .drop("toks")
      .withColumn("fail_len",
        col("n_tokens") < MinTokens || col("n_tokens") > MaxTokens)
      .withColumn("fail_word_len",
        col("avg_token_len") < MinAvgTokenLen ||
          col("avg_token_len") > MaxAvgTokenLen)
      .withColumn("fail_diversity", col("distinct_ratio") < MinDistinctRatio)
      .withColumn("fail_top_token", col("top_token_ratio") > MaxTopTokenRatio)
      .withColumn("fail_stop", col("stop_hits") < 1L)
      .withColumn("pass",
        !col("fail_len") && !col("fail_word_len") && !col("fail_diversity") &&
          !col("fail_top_token") && !col("fail_stop"))
  }

  /** Per-source rollup of the rule battery — the curation dashboard view. */
  def qualitySummary(docs: DataFrame): DataFrame = {
    def cnt(c: String): Column = sum(col(c).cast("long")).as(s"n_$c")
    qualityFlags(docs)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        cnt("fail_len"), cnt("fail_word_len"), cnt("fail_diversity"),
        cnt("fail_top_token"), cnt("fail_stop"), cnt("pass"))
      .orderBy(col("source"))
  }

  def qualitySummaryQuery(s: SparkSession, dir: String): DataFrame =
    qualitySummary(Tables.documents(s, dir))
}
