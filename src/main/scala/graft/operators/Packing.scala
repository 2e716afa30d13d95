package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Sequence packing and chunking — the steps between a curated corpus
  * and a token-budgeted training batch.
  *
  * [[packingPlan]] is "concatenate in canonical order, then cut every B
  * tokens": each document's global token OFFSET decides its context
  * window (bin), and a document whose span crosses a cut boundary is
  * flagged (real packers either split it there or pad — either way the
  * crossing set is the quantity to minimize/report). The global offset
  * is a prefix sum, built WITHOUT a single-partition window: documents
  * land in canonical-order buckets, within-bucket cumulative sums ride a
  * bucket-keyed window, and each bucket's base offset comes from the
  * (bucket → token total) prefix table — dimension-sized, broadcast
  * (the same zipWithIndex-style construction as the Gini ranking; the
  * oracle states one plain global window instead).
  *
  * [[chunks]] is the retrieval-side splitter: overlapping fixed-size
  * token windows per document (chunk k, stride s), emitted as real rows
  * — a pure per-row explode, embarrassingly parallel.
  */
object Packing {

  /** Per-bin packing summary for context budget `budgetTokens`.
    *
    * @param docs        (doc_id, text)
    * @param bucketWidth docs per canonical-order bucket (load-balance
    *                    knob only; result-invariant)
    */
  def packingPlan(docs: DataFrame, budgetTokens: Long,
      bucketWidth: Long): DataFrame = {
    val sized = docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") >= 1)
      .withColumn("b", floor(col("doc_id") / lit(bucketWidth)).cast("long"))
    val prefix = sized.groupBy(col("b")).agg(sum(col("n")).as("t"))
      .withColumn("base",
        coalesce(sum(col("t")).over(
          Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("base")) // one row per bucket: broadcast
    val inBucket = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("cum", sum(col("n")).over(inBucket))
      .join(broadcast(prefix), "b")
      .withColumn("end", col("base") + col("cum"))      // exclusive
      .withColumn("start", col("end") - col("n"))       // inclusive
      .withColumn("bin", floor(col("start") / lit(budgetTokens)).cast("long"))
      .withColumn("crosses",
        floor((col("end") - 1) / lit(budgetTokens)).cast("long") > col("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
        sum(when(col("crosses"), 1L).otherwise(0L)).as("n_crossing"))
      .orderBy(col("bin"))
  }

  /** q100: pack the corpus into 512-token context windows; per window,
    * how many documents start there, their token mass, and how many
    * straddle the next cut.
    */
  def packingQuery(s: SparkSession, dir: String): DataFrame =
    packingPlan(Tables.documents(s, dir), budgetTokens = 512L,
      bucketWidth = 256L)

  /** Overlapping token chunks: chunk `k` tokens, stride `s` (`k − s`
    * token overlap); the tail chunk may be short, and every token of
    * every document lands in ≥ 1 chunk.
    */
  def chunks(docs: DataFrame, k: Int, s: Int): DataFrame = {
    require(k >= 1 && s >= 1 && s <= k, "need 1 <= stride <= chunk")
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L),
          floor((col("n") - 1) / lit(s.toLong)).cast("long"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("t"), (col("chunk_id") * s + 1).cast("int"), lit(k)))
          .as("chunk_text"),
        size(slice(col("t"), (col("chunk_id") * s + 1).cast("int"), lit(k)))
          .cast("long").as("n_tokens"))
  }

  /** q101: 64-token chunks at stride 48 (16-token overlap) — the
    * embedding-index splitter, summarized per document so the driver
    * row count stays stable (the chunk rows themselves are the
    * operator's product; ChunkingSpec pins their exact content).
    */
  def chunkingQuery(s: SparkSession, dir: String): DataFrame =
    chunks(Tables.documents(s, dir), k = 64, s = 48)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("chunk_token_sum"),
        max(col("n_tokens")).as("max_chunk"),
        min(col("n_tokens")).as("min_chunk"))
      .orderBy(col("doc_id"))
}
