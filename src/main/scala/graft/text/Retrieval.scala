package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Retrieval scoring: Okapi BM25 over the token index, and reciprocal-
  * rank fusion of a text ranking with a vector (cosine) ranking — the
  * hybrid-search primitive of a RAG stack.
  *
  * BM25 constants (k1 = 1.2, b = 0.75) are FIXED decimal literals, not
  * parameters: the DuckDB oracle must parse the exact same doubles, and
  * derived constants computed at runtime (1 − b, k1 + 1) can land one
  * ulp away from their decimal spellings — so both engines spell 2.2,
  * 1.2, 0.25 and 0.75 literally.
  *
  * Scale shape: document length rides the explode (no corpus-wide
  * length join); the query-term filter cuts the token stream BEFORE the
  * tf aggregation; corpus stats and per-term dfs are one-row/|Q|-row
  * broadcasts. Rankings are cut to top-k by TakeOrderedAndProject
  * first; the rank row_numbers run over the ≤ k survivors only.
  */
object Retrieval {

  /** BM25 score per document containing ≥ 1 query term:
    * Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), with the
    * Lucene-style positive idf ln(1 + (N − df + 0.5)/(df + 0.5)).
    */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val base = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
      .filter(col("dl") >= 1)
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0)
        + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s", col("idf") * (col("tf") * lit(2.2))
        / (col("tf") + lit(1.2)
          * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
  }

  /** Reciprocal-rank fusion: rrf(d) = Σ_systems 1/(60 + rank_d), over
    * the top-`cut` of each system; documents missing from a system
    * contribute nothing for it (full-outer semantics).
    */
  private def topRanks(scored: DataFrame, scoreCol: String, cut: Int,
      rankName: String): DataFrame = {
    val top = scored
      .orderBy(round(col(scoreCol), 6).desc, col("doc_id"))
      .limit(cut) // TakeOrderedAndProject: the global sort never happens
    top.withColumn(rankName,
      row_number().over(Window // ≤ cut rows by construction
        .orderBy(round(col(scoreCol), 6).desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col(rankName))
  }

  /** q102: hybrid retrieval for the query ("join merge sort", vector =
    * embedding 0): BM25 top-50 fused with cosine top-50 by RRF, top-20
    * reported. At sf0.1 only a subset of documents carries an embedding
    * — exactly the partial-index case full-outer RRF exists for.
    */
  def hybridQuery(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val terms = Seq("join", "merge", "sort")
    val text = topRanks(
      bm25Scores(Tables.documents(s, dir).filter(col("doc_id") =!= 0), terms),
      "score", 50, "rank_text")
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"))
    val vec = topRanks(
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          GraftFunctions.cosine(col("q_embedding"), col("embedding"))
            .as("cos")),
      "cos", 50, "rank_vec")
    text.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (col("rank_text") + 60), lit(0.0))
          + coalesce(lit(1.0) / (col("rank_vec") + 60), lit(0.0)))
      .orderBy(round(col("rrf"), 6).desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("rank_text"), col("rank_vec"),
        round(col("rrf"), 6).as("rrf"))
  }
}
