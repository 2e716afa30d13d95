package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PMI collocation mining [Church & Hanks, "Word Association Norms,
  * Mutual Information, and Lexicography", CL 1990]: rank adjacent word
  * pairs by pointwise mutual information ln(N·c(w₁w₂) / (c(w₁)·c(w₂))),
  * floored on a minimum pair count so rare coincidences can't dominate —
  * the standard multi-word-expression extractor (and the text twin of
  * q85's event-transition PMI). Complements q50 (raw bigram counts): PMI
  * normalizes away unigram popularity.
  *
  * 100 TB shape: unigram and bigram counts are the word-count shape
  * (explode → map-side partial aggregation); the min-count floor filters
  * the bigram table BEFORE the two unigram joins, so the joined table is
  * collocation-sized, not corpus-sized; the corpus total rides a 1-row
  * broadcast. PMI rounds to 6 dp and ranks (pmi desc, bigram) so the
  * top-k cut is deterministic.
  */
object Collocations {

  def pmiCollocations(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val total = uni.agg(sum(col("cw")).as("n"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(TextOps.tokenWindows(col("t"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
    bi
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c12"),
        round(log(col("n").cast("double") * col("c12")
          / (col("c1") * col("c2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }

  def collocationsQuery(s: SparkSession, dir: String): DataFrame =
    pmiCollocations(Tables.documents(s, dir), minCount = 20L, k = 50)
}
