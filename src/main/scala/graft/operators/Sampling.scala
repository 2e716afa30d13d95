package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and stratified sampling for training
  * pipelines. Both are pure column arithmetic — no RNG state, no
  * `rand()` — so a re-run (or a different engine: see the q44 oracle)
  * assigns every row identically, and assignment survives repartitioning.
  *
  * The hash is a multiplicative (Knuth) hash restricted to plain int64
  * ops: h = ((id mod 1000003) · 2654435761) mod 2³¹, buckets taken from
  * the HIGH bits (low bits of a multiplicative hash are biased — with
  * K ≡ 1 (mod 10), (x·K) mod 10 would just echo x mod 10). The mod-p
  * pre-fold keeps every intermediate < 2⁶³. For adversarial id spaces use
  * xxhash64 instead (same shape, engine-only — not oracle-reproducible).
  */
object Sampling {

  private val P = 1000003L          // prime pre-fold (bounds the product)
  private val K = 2654435761L       // Knuth's multiplicative constant
  private val M = 2147483648L       // 2^31

  /** Hash to [0, 2³¹) — uniform enough for splits, exactly reproducible
    * in any engine with int64 arithmetic.
    */
  def hashUnit(id: Column): Column =
    pmod(pmod(id, lit(P)) * lit(K), lit(M))

  /** Hash bucket in [0, buckets) from the hash's high bits. */
  def hashBucket(id: Column, buckets: Int): Column =
    floor(hashUnit(id) * lit(buckets.toLong) / lit(M.toDouble)).cast("long")

  /** train/val/test label at 80/10/10 over 10 hash buckets. */
  def splitLabel(id: Column): Column = {
    val b = hashBucket(id, 10)
    when(b < 8, "train").when(b === 8, "val").otherwise("test")
  }

  /** Deterministic stratified sample: within each stratum, rank rows by
    * (hash, id) and keep the first ⌈n·frac⌉ — every stratum contributes
    * its exact proportion (ceil), and membership is stable under re-runs
    * and engine changes. One window shuffle on the stratum key.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratum: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, "frac in (0, 1]")
    val w = Window.partitionBy(col(stratum)).orderBy(hashUnit(col(idCol)), col(idCol))
    val cw = Window.partitionBy(col(stratum))
    df.withColumn("__rnk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rnk") <= ceil(col("__n") * frac))
      .drop("__rnk", "__n")
  }

  /** q44: a 20% language-stratified sample of the corpus with each doc's
    * train/val/test split label — the front door of a training pipeline.
    */
  def sampleQuery(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(graft.Tables.documents(s, dir), "doc_id", "lang", 0.2)
      .select(col("doc_id"), col("lang"), splitLabel(col("doc_id")).as("split"))
      .orderBy(col("doc_id"))

  /** Leakage-safe train/val/test split: the split label is a function of
    * the NEAR-DUP CLUSTER id, not the document id, so two near-duplicate
    * documents can never land in different splits — the eval-contamination
    * failure mode of per-row hashing (a val doc whose near-copy sits in
    * train silently inflates eval scores). Docs outside any near-dup pair
    * are their own singleton cluster (cluster_id = doc_id).
    *
    * Composition: the exact-Jaccard pair miner → star-contraction
    * connected components (both existing operators, both bucketed — see
    * [[graft.dedup.Dedup]]) → the same multiplicative-hash split as
    * [[splitLabel]], applied to the cluster id. The cluster table is the
    * only addition over q44's per-row split; facts join it on doc_id once.
    */
  def leakageSafeSplit(docs: DataFrame, k: Int, threshold: Double,
      maxDf: Int = 100): DataFrame =
    leakageSafeSplit(docs, graft.dedup.Dedup.connectedComponents(
      graft.dedup.Dedup.jaccardPairs(docs, k, threshold, maxDf)
        .select(col("id_a"), col("id_b"))))

  /** [[leakageSafeSplit]] over a prebuilt cluster table — the query
    * path passes the [[graft.dedup.Dedup.clustersShared]] view.
    */
  def leakageSafeSplit(docs: DataFrame, cc: DataFrame): DataFrame = {
    docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", splitLabel(col("cluster_id")))
      .orderBy(col("doc_id"))
  }

  /** q111: cluster-aware split of the documents corpus (q40's mining
    * parameters), so near-dups share a split by construction.
    */
  def leakageSafeSplitQuery(s: SparkSession, dir: String): DataFrame =
    leakageSafeSplit(graft.Tables.documents(s, dir),
      graft.dedup.Dedup.clustersShared(s, dir))

  /** Deterministic weighted Bernoulli sample: row i kept iff
    * hashUnit(id)/2³¹ < targetFrac · wᵢ/mean(w), capped at 1 — the
    * corpus-temperature step (sample high-quality or long documents at a
    * proportionally higher rate) with zero RNG state. Expected kept mass
    * ≈ targetFrac of rows while weights stay uncapped; membership is a
    * pure function of (id, weight, corpus mean), reproducible on any
    * engine. The mean is a 1-row aggregate broadcast into the predicate —
    * stays lazy, nothing collects to the driver.
    *
    * Cross-engine fp note: the comparison is safe because hashUnit/2³¹ is
    * a dyadic rational on a 2⁻³¹ grid while summation-order drift in
    * mean(w) perturbs the threshold by ~1e-16 — nine orders of magnitude
    * below the grid.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String,
      targetFrac: Double): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac in (0, 1]")
    val mw = df.agg(avg(col(weightCol)).as("__mw"))
    df.crossJoin(broadcast(mw))
      .filter(hashUnit(col(idCol)).cast("double") / lit(M.toDouble)
        < least(lit(1.0), lit(targetFrac) * col(weightCol) / col("__mw")))
      .drop("__mw")
  }

  /** q63: token-count-weighted 30% document sample — long documents kept
    * at proportionally higher rate (training-token-budget sampling).
    */
  def weightedQuery(s: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.documents(s, dir)
      .withColumn("w",
        size(graft.text.TextOps.tokens(col("text"))).cast("double"))
    weightedSample(d, "doc_id", "w", targetFrac = 0.3)
      .select(col("doc_id"), col("lang"), col("w").cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }
}
