package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-source lexical divergence from the corpus — KL(source ‖ corpus) and
  * total-variation distance over Laplace-smoothed unigram distributions on
  * the shared df-floored vocabulary. The corpus-mixture diagnostic every
  * pretraining dashboard carries next to the mixture planner (q113): a
  * source whose unigram distribution drifts far from the blend is either a
  * different register (code, boilerplate, another domain) or a broken
  * ingest, and both show up here before they show up in model evals.
  * Smoothing makes both divergences finite for sources that miss vocabulary
  * words (the McCallum & Nigam treatment, same as q114/q131).
  *
  * Reference tie: the per-source composition rollups of the reference's
  * analytics layer (README.md dashboard queries), upgraded from row counts
  * to distribution distances.
  *
  * 100 TB shape: the corpus is exploded and shuffled ONCE — a single
  * (source, token)-keyed partial aggregation; the df floor and corpus
  * counts roll up from that (source × vocab)-sized table, never from a
  * second corpus scan. The densified (vocab × sources) frame joins the
  * per-source counts on the (source, token) key (vocabulary-sized, never
  * broadcast); only the |sources| totals, corpus total, and |V| ride
  * broadcasts. The divergence itself is one partial-aggregated rollup to
  * |sources| rows.
  */
object Divergence {

  /** (source, n_tokens, kl, tvd) per source, source-ascending.
    *
    * @param minDf shared-vocabulary floor (distinct docs, whole corpus);
    *              out-of-vocabulary tokens are excluded from BOTH
    *              distributions (and from n_tokens)
    */
  def sourceDivergence(docs: DataFrame, minDf: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
      explode(TextOps.tokens(col("text"))).as("token"))
    // ONE exploded-corpus aggregation; the corpus-wide df floor then rolls
    // up from the (source, token) table — a doc belongs to exactly one
    // source, so corpus df = Σ per-source distinct-doc counts (no second
    // corpus scan, no vocab join)
    // both rollup tables are consumed from several branches below
    // (perSourceAll twice; corpus four times: the vocab semi, the two
    // scalar totals, the densify base) — checkpoint them so the
    // exploded-corpus aggregation runs once, not once per consumer
    val perSourceAll = tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"), countDistinct(col("doc_id")).as("sdf"))
      .localCheckpoint()
    val corpus = perSourceAll.groupBy(col("token"))
      .agg(sum(col("c")).as("cg"), sum(col("sdf")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("cg")) // vocabulary-sized
      .localCheckpoint()
    val perSource = perSourceAll
      .join(corpus.select("token"), Seq("token"))
      .select(col("source"), col("token"), col("c"))
    val sourceTotals = perSource.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens")) // |sources| rows
    val corpusTotal = corpus.agg(sum(col("cg")).as("ng"))
    val vocabSize = corpus.agg(count(lit(1)).as("v"))

    // densify to EVERY (source, vocab token) pair so smoothing covers the
    // words a source never uses — the same q114 model-build shape
    val dense = corpus
      .crossJoin(broadcast(sourceTotals))
      .join(perSource, Seq("source", "token"), "left")
      .crossJoin(broadcast(corpusTotal))
      .crossJoin(broadcast(vocabSize))
      .select(col("source"), col("n_tokens"),
        ((coalesce(col("c"), lit(0L)) + 1.0) / (col("n_tokens") + col("v")))
          .as("p"),
        ((col("cg") + 1.0) / (col("ng") + col("v"))).as("q"))

    dense.groupBy(col("source"))
      .agg(
        first(col("n_tokens")).as("n_tokens"),
        round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl"),
        round(sum(abs(col("p") - col("q"))) * 0.5, 6).as("tvd"))
      .orderBy(col("source"))
  }

  def sourceDivergenceQuery(s: SparkSession, dir: String): DataFrame =
    sourceDivergence(Tables.documents(s, dir), minDf = 5)
}
