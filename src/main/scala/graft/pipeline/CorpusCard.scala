package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{QualityRules, TextOps}

/** Dataset-card statistics [Gebru et al., "Datasheets for Datasets",
  * arXiv:1803.09010; the corpus-level summary every released training set
  * ships with]: one call → one (stat, value) table covering size,
  * composition, duplication, and quality-gate pass rate. A composition
  * over the engine's own operators (tokenizer, exact-dup keying, q112's
  * rule battery) rather than new machinery — the report a curation run
  * publishes next to its output.
  *
  * 100 TB shape: three partial-aggregated passes over the corpus (global
  * scalars; token/rule signals per-row with array folds; distinct-text
  * count keyed on xxhash64+text like the exact-dedup tier) — no windows,
  * no joins wider than the 1-row cross of the final assembly. Ratios
  * round to 6 dp.
  */
object CorpusCard {

  def card(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val basic = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks)).cast("double").as("n_tokens"),
      countDistinct(col("source")).cast("double").as("n_sources"),
      countDistinct(col("lang")).cast("double").as("n_langs"))
    // distinct texts keyed the exact-dedup way: 8-byte hash + text guard
    val distinctTexts = docs.select(xxhash64(col("text")).as("h"), col("text"))
      .distinct()
      .agg(count(lit(1)).cast("double").as("n_distinct_texts"))
    val pass = QualityRules.qualityFlags(docs).agg(
      sum(col("pass").cast("long")).cast("double").as("n_pass"))
    basic.crossJoin(broadcast(distinctTexts)).crossJoin(broadcast(pass))
      .select(explode(array(
        struct(lit("n_docs").as("stat"),
          col("n_docs").cast("double").as("value")),
        struct(lit("n_tokens").as("stat"), col("n_tokens").as("value")),
        struct(lit("n_sources").as("stat"), col("n_sources").as("value")),
        struct(lit("n_langs").as("stat"), col("n_langs").as("value")),
        struct(lit("mean_doc_tokens").as("stat"),
          round(col("n_tokens") / col("n_docs"), 6).as("value")),
        struct(lit("exact_dup_rate").as("stat"),
          round(lit(1.0) - col("n_distinct_texts") / col("n_docs"), 6)
            .as("value")),
        struct(lit("quality_pass_rate").as("stat"),
          round(col("n_pass") / col("n_docs"), 6).as("value")))).as("s"))
      .select(col("s.stat"), col("s.value"))
      .orderBy(col("stat"))
  }

  def cardQuery(s: SparkSession, dir: String): DataFrame =
    card(Tables.documents(s, dir))
}
