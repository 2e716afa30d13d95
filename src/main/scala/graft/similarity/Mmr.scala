package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Maximal Marginal Relevance re-ranking [Carbonell & Goldstein, SIGIR
  * 1998]: greedily pick the candidate maximizing
  * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) — relevance discounted by
  * similarity to what's already selected. The missing last stage of the
  * retrieval tier (q26 scores, q102 fuses rankings, MMR de-redundifies
  * the final page): a plain top-k over a near-dup-heavy corpus returns
  * k copies of one answer; MMR returns k answers.
  *
  * Scale shape: the ONLY corpus-scale work is the relevance pass — the
  * q26 broadcast-probe + codegen-cosine + window top-N scan. Everything
  * after runs on the N-row candidate set: the N² similarity matrix and
  * k greedy steps, each an argmax over ≤N scored rows (1-row collects —
  * the documented scalar pattern; candidate state is localCheckpointed
  * so steps never re-touch the corpus). At 100 TB, N and k are page
  * constants; MMR's cost IS the top-N scan the caller already pays.
  *
  * Determinism/oracle: every argmax orders by (round(score, 6) DESC,
  * id) — the q26 tie discipline — and the λ-arithmetic is mirrored
  * operation-for-operation, so DuckDB replays the full greedy
  * trajectory bit-for-bit.
  */
object Mmr {

  /** Greedy MMR selection over a scored candidate set.
    *
    * @param cands (id, rel) candidate relevances (candidate-set-sized)
    * @param sims  (a, b, sim) pairwise similarities among candidates
    * @return (rank, id, rel, mmr) for the k selected, in pick order;
    *         step 1's mmr is λ·rel (empty selected set ⇒ no penalty)
    */
  def select(cands: DataFrame, sims: DataFrame, k: Int,
             lambda: Double): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands.localCheckpoint()
    val sm = sims.localCheckpoint()
    val picked = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double)]()
    while (picked.size < k) {
      val selIds = picked.map(_._2).toSeq
      val scored =
        if (selIds.isEmpty)
          c.select(col("id"), col("rel"),
            (lit(lambda) * col("rel")).as("score"))
        else
          c.filter(!col("id").isin(selIds: _*))
            .join(sm.filter(col("b").isin(selIds: _*))
                .groupBy(col("a").as("id"))
                .agg(max(col("sim")).as("ms")),
              Seq("id"))
            .select(col("id"), col("rel"),
              (lit(lambda) * col("rel")
                - lit(1.0 - lambda) * col("ms")).as("score"))
      val top = scored
        .orderBy(round(col("score"), 6).desc, col("id"))
        .limit(1).collect()
      require(top.nonEmpty, s"MMR: candidate set exhausted at step ${picked.size + 1}")
      val r = top(0)
      picked += ((picked.size + 1L, r.getLong(0), r.getDouble(1), r.getDouble(2)))
    }
    picked.toSeq.toDF("rank", "id", "rel", "mmr")
  }

  /** The one corpus-scale pass: broadcast-probe relevance + top-N.
    * orderBy+limit compiles to TakeOrderedAndProject — per-partition
    * top-N merged on the driver, never a single-partition window sort
    * (PlanSpec pins this).
    */
  def topCandidates(e: DataFrame, probeId: Long, n: Int): DataFrame = {
    val q = e.filter(col("vec_id") === probeId)
      .select(col("embedding").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= probeId)
      .select(col("vec_id").as("id"), col("embedding"),
        GraftFunctions.cosine(col("qv"), col("embedding")).as("rel"))
      .orderBy(round(col("rel"), 6).desc, col("id"))
      .limit(n)
  }

  /** q179: MMR page over the embeddings corpus — probe vec_id 1,
    * candidates = top-12 by cosine, λ = 0.7, page size 6.
    */
  def mmrQuery(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cands = topCandidates(e, probeId = 1L, n = 12)
      .localCheckpoint() // 12 rows: the only corpus-scale pass is above
    val sims = cands.select(col("id").as("a"), col("embedding").as("va"))
      .join(cands.select(col("id").as("b"), col("embedding").as("vb")),
        col("a") =!= col("b"))
      .select(col("a"), col("b"),
        GraftFunctions.cosine(col("va"), col("vb")).as("sim"))
    select(cands.select(col("id"), col("rel")), sims, k = 6, lambda = 0.7)
      .select(col("rank"), col("id").as("doc_id"),
        round(col("rel"), 4).as("relevance"),
        round(col("mmr"), 4).as("mmr_score"))
      .orderBy(col("rank"))
  }
}
