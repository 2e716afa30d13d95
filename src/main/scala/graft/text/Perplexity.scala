package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** LM-perplexity quality filtering [Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", arXiv:1911.00359 §4.3
  * — the Common Crawl curation step that scores every document with a
  * held-out language model and gates on perplexity]: an add-one-smoothed
  * bigram LM trained on the even-doc_id half of the corpus scores the odd
  * half; per-source rollup of mean negative log-likelihood and the
  * above-threshold census. Complements q62 (corpus-wide surprisal, no
  * held-out split) and q114 (class-conditional NB): this is the
  * *generative* quality gate.
  *
  * Out-of-vocabulary handling is the standard closed-vocab mapping: train
  * tokens below the count floor — and every unseen test token — collapse
  * to `<unk>` BEFORE bigram formation, so every test bigram has a defined
  * smoothed probability.
  *
  * 100 TB shape: the bigram MODEL is built with word-count shapes (explode
  * → partial-aggregated counts keyed on the pair); scoring joins test
  * bigrams against the model on the SAME pair key — a keyed shuffle, not a
  * broadcast, because a web-scale bigram table outgrows any broadcast
  * budget (the vocab and LHS-total tables stay broadcast: they are capped
  * by the count floor). Per-doc NLL rounds to 6 dp before the rollup and
  * the threshold compare, so the oracle reproduces both exactly.
  */
object Perplexity {

  /** Per-source perplexity-filter summary over the odd-doc_id holdout:
    * (source, n_docs, avg_nll, n_high_ppl).
    */
  def sourceSummary(docs: DataFrame, minCount: Int,
                    nllThreshold: Double): DataFrame = {
    val tk = docs.select(
      col("doc_id"), col("source"), TextOps.tokens(col("text")).as("toks"))
    val train = tk.filter(col("doc_id") % 2 === 0)
    val test  = tk.filter(col("doc_id") % 2 =!= 0)

    // closed vocabulary: train tokens at or above the count floor
    val trainTok = train.select(
      col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
    val vocab = trainTok.groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select(col("token"))

    def unked(exploded: DataFrame): DataFrame = exploded
      .join(broadcast(vocab.withColumn("__v", lit(1))), Seq("token"), "left")
      .withColumn("tok",
        when(col("__v").isNull, lit("<unk>")).otherwise(col("token")))
      .drop("__v", "token")

    def bigrams(exploded: DataFrame, keys: Seq[String]): DataFrame = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      exploded
        .withColumn("w1", lag(col("tok"), 1).over(w))
        .filter(col("w1").isNotNull)
        .select((keys.map(col) :+ col("w1") :+ col("tok").as("w2")): _*)
    }

    // model: smoothed P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), V = |vocab|+1
    val trainBi = bigrams(unked(trainTok), Seq("doc_id"))
    val pairCounts = trainBi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val lhsTotals = pairCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vSize = vocab.agg((count(lit(1)) + 1L).as("v"))

    val testTok = test.select(
      col("doc_id"), col("source"), posexplode(col("toks")).as(Seq("pos", "token")))
    val scoredPairs = bigrams(unked(testTok), Seq("doc_id", "source"))
      .join(pairCounts, Seq("w1", "w2"), "left")       // pair-keyed shuffle
      .join(broadcast(lhsTotals), Seq("w1"), "left")   // vocab-sized
      .crossJoin(broadcast(vSize))
      .withColumn("lp",
        log((coalesce(col("c12"), lit(0L)) + 1.0)
          / (coalesce(col("c1"), lit(0L)) + col("v"))))
    val perDoc = scoredPairs
      .groupBy(col("doc_id"), col("source"))
      .agg(round(-avg(col("lp")), 6).as("nll"))
    perDoc
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("nll")), 6).as("avg_nll"),
        sum(when(col("nll") > nllThreshold, 1L).otherwise(0L)).as("n_high_ppl"))
      .orderBy(col("source"))
  }

  def sourceSummaryQuery(s: SparkSession, dir: String): DataFrame =
    sourceSummary(Tables.documents(s, dir), minCount = 5, nllThreshold = 4.2)
}
