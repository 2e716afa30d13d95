package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.operators.Sampling
import graft.text.TextOps

/** End-to-end training-data curation — the flagship composition query:
  * the whole document pipeline a pre-training run needs, chained from the
  * engine's own operators, fully deterministic and SQL-mirrorable:
  *
  *   1. quality gate     — token floor from [[TextOps.textStats]]
  *   2. exact dedup      — keep the min doc_id per identical text
  *   3. near-dup dedup   — keep only cluster representatives from the
  *                         exact-Jaccard pair graph's connected components
  *   4. split assignment — deterministic hash split ([[Sampling]])
  *
  * Plan shape: the gate is a narrow filter over one stats projection; the
  * exact-dedup keep-rule is one 8-byte-hash-keyed exchange plus a
  * (hash, text) window min (keeps all columns without a self-join, and the
  * shuffle never partitions on the multi-KB text — [[Dedup.exactKeepRows]]);
  * the near-dup drop is one left join against the (tiny) cluster table;
  * the split label is pure arithmetic. Nothing collects to the driver
  * except the CC convergence counters.
  */
object Curation {

  /** @param minTokens quality-gate floor (documents shorter than this are
    *                  noise for training purposes)
    */
  def curate(docs: DataFrame, minTokens: Long = 20L): DataFrame =
    // near-dup clusters over the FULL corpus (drop decisions must not
    // depend on what the quality gate removed first)
    curate(docs, minTokens, Dedup.connectedComponents(
      Dedup.jaccardPairs(docs, k = 5, threshold = 0.2, maxDf = 100)
        .select(col("id_a"), col("id_b"))))

  /** [[curate]] over a prebuilt cluster table — the query path passes
    * the [[Dedup.clustersShared]] view the other dedup queries share.
    */
  def curate(docs: DataFrame, minTokens: Long,
      clusters: DataFrame): DataFrame = {
    // narrow stat columns — a join against textStats(docs) would shuffle
    // the whole corpus on doc_id to reattach a per-row projection
    val gated = TextOps.withQuality(docs)
      .filter(col("n_tokens") >= minTokens)
    // hash-bucketed exchange (8-byte key, never the multi-KB text) with
    // exact (hash, text)-window semantics — see Dedup.exactKeepRows
    val exactKept = Dedup.exactKeepRows(gated)
    // no broadcast hint: the cluster table is docs-with-a-near-dup, which
    // on a dirty corpus can be a large fraction of the input — AQE
    // converts this join to broadcast at runtime when it actually is small
    exactKept.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality_score"),
        Sampling.splitLabel(col("doc_id")).as("split"))
      .orderBy(col("doc_id"))
  }

  def curateQuery(s: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(s, dir), minTokens = 20L,
      Dedup.clustersShared(s, dir))

  /** q105: the retrieval-side sibling of [[curate]] — prep a corpus for
    * an embedding index: quality gate → exact dedup → overlapping token
    * chunks, reported as one summary row (per-chunk rows are q101's
    * surface; here the composition itself is under test). Same gate and
    * keep-rule as q48, then [[graft.operators.Packing.chunks]] at the
    * q101 geometry (64/48).
    */
  def ragPrep(docs: DataFrame, minTokens: Long = 20L): DataFrame = {
    val gated = TextOps.withQuality(docs)
      .filter(col("n_tokens") >= minTokens)
    val kept = Dedup.exactKeepRows(gated)
    graft.operators.Packing.chunks(kept.select(col("doc_id"), col("text")),
        k = 64, s = 48)
      .agg(countDistinct(col("doc_id")).as("n_docs_kept"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("chunk_tokens"),
        round(sum(col("n_tokens")).cast("double")
          / count(lit(1)).cast("double"), 4).as("avg_chunk_tokens"))
  }

  def ragPrepQuery(s: SparkSession, dir: String): DataFrame =
    ragPrep(Tables.documents(s, dir))
}
