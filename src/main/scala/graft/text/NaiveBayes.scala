package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multinomial Naive Bayes text classifier, trained and evaluated fully
  * inside the engine [McCallum & Nigam, "A Comparison of Event Models for
  * Naive Bayes Text Classification", AAAI-98 workshop]: token likelihoods
  * with Laplace (+1) smoothing over a df-capped vocabulary, log-space
  * scoring, argmax with a deterministic tie-break. Train on even doc_ids,
  * score odd doc_ids — a leakage-free holdout — and emit the
  * (true lang, predicted lang) confusion matrix. This is the trainable
  * counterpart of q22's fixed-marker language-ID: the lightweight
  * classifier tier every corpus pipeline runs for language / quality /
  * domain routing.
  *
  * Reference tie: the classification row of the reference's ML feature
  * surface (/root/reference/README.md:321-336), re-expressed as a
  * first-class distributed operator instead of a Databricks ML handoff.
  *
  * 100 TB shape: training explodes and shuffles the corpus ONCE — a
  * single (lang, token)-keyed partial aggregation; the df floor rolls up
  * from that (langs × vocab)-sized table (a doc has exactly one lang, so
  * corpus df = Σ per-lang distinct-doc counts). The MODEL
  * (vocab × |langs| log-likelihoods) is VOCABULARY-sized, not
  * dimension-sized: a df floor on a web corpus still leaves 10⁷+ tokens, so
  * the model must never be broadcast. Scoring joins the exploded test
  * tokens to the model on the `token` key — a keyed shuffle, the same call
  * q123 makes for its bigram table ([[Perplexity]]) — followed by one
  * per-(doc, lang) partial aggregation. Only the genuinely tiny sides ride
  * broadcasts: `priors`/`langs` (|langs| rows) and `vocabSize` (1 row).
  * Scores round to 6 decimals before the argmax so the DuckDB oracle
  * reproduces every tie and boundary; ties break toward the
  * lexicographically smallest language on both sides.
  */
object NaiveBayes {

  /** Confusion matrix (lang, pred_lang, n) over the odd-doc_id holdout.
    *
    * @param minDf vocabulary floor: tokens seen in ≥ minDf distinct
    *              training docs. Out-of-vocabulary test tokens are skipped
    *              (deterministic; the standard multinomial-NB treatment).
    */
  def langConfusion(docs: DataFrame, minDf: Int): DataFrame = {
    val tk = docs.select(
      col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("toks"))
    val train = tk.filter(col("doc_id") % 2 === 0)
    val test  = tk.filter(col("doc_id") % 2 =!= 0)

    val trainTok = train.select(
      col("doc_id"), col("lang"), explode(col("toks")).as("token"))

    // ONE aggregation over the exploded training corpus carries both the
    // per-(lang, token) counts and the df floor: a doc has exactly one
    // lang, so corpus df = Σ per-lang distinct-doc counts — no second
    // corpus scan, no vocab join back onto the token stream
    val perLang = trainTok.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("c"), countDistinct(col("doc_id")).as("ldf"))
    val vocab = perLang.groupBy(col("token"))
      .agg(sum(col("ldf")).as("df"))
      .filter(col("df") >= minDf)
      .select("token")

    // class priors from training DOC counts (log space); the corpus total
    // rides a broadcast cross-join of the 1-row aggregate — no driver action
    val nTrainDocs = train.agg(count(lit(1)).as("n_train"))
    val priors = train.groupBy(col("lang"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(nTrainDocs))
      .select(col("lang"),
        log(col("nd").cast("double") / col("n_train")).as("log_prior"))
    val langs = priors.select(col("lang"))

    // per-(lang, token) counts restricted to the vocabulary (a join on the
    // (lang × vocab)-sized table, not the token stream), then densified to
    // EVERY (lang, vocab token) pair so Laplace smoothing covers unseen pairs
    val cnt = perLang
      .join(vocab, Seq("token"))
      .select(col("lang"), col("token"), col("c"))
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("tc"))
    val vocabSize = vocab.agg(count(lit(1)).as("v"))
    val model = vocab.crossJoin(broadcast(langs))
      .join(cnt, Seq("lang", "token"), "left")
      .join(tot, Seq("lang"))
      .crossJoin(broadcast(vocabSize))
      .select(col("lang"), col("token"),
        log((coalesce(col("c"), lit(0L)) + 1.0)
          / (col("tc") + col("v"))).as("log_p"))

    // score: join exploded test tokens to the vocabulary-sized model on the
    // token key — a keyed shuffle, never a broadcast (the model outgrows
    // broadcast on any real corpus; same reasoning as q123's bigram join).
    // Docs whose tokens are ALL out-of-vocabulary still score (prior only)
    // via the left join against the dense doc × lang frame
    val testTok = test.select(col("doc_id"), explode(col("toks")).as("token"))
    val contrib = testTok
      .join(model, Seq("token"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("log_p")).as("s"))
    val scored = test.select(col("doc_id"), col("lang").as("true_lang"))
      .crossJoin(broadcast(priors))
      .join(contrib, Seq("doc_id", "lang"), "left")
      .withColumn("score",
        round(col("log_prior") + coalesce(col("s"), lit(0.0)), 6))

    // argmax with lang-ascending tie-break: min over (-score, lang)
    val pred = scored
      .groupBy(col("doc_id"), col("true_lang"))
      .agg(min(struct((-col("score")).as("neg"), col("lang")))
        .getField("lang").as("pred_lang"))

    pred.groupBy(col("true_lang").as("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  def langConfusionQuery(s: SparkSession, dir: String): DataFrame =
    langConfusion(Tables.documents(s, dir), minDf = 5)
}
