package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocking-quality evaluation for the entity-resolution tier — the
  * two numbers every record-linkage deployment publishes about its
  * blocking scheme [Christen, "Data Matching", ch. 7: reduction ratio
  * and pairs completeness]: how much of the n² comparison space the
  * blocks avoid (reduction ratio), and how much of the TRUE match set
  * the blocks still reach (pairs completeness). The interesting gap is
  * structural: q164's identity is TRANSITIVE (A–B by email, B–C by
  * phone ⇒ A–C), so true pairs include connections no single block
  * contains — `n_transitive_only` counts exactly the pairs only the
  * connected-components pass recovers, which is the measured argument
  * for running CC at all instead of stopping at blocked pairs.
  *
  * Scale shape: candidate generation is the same two blocked equi-joins
  * as [[GoldenRecord.golden]] (hash exchange on the link key, never a
  * cross join); the true-pair count needs NO pair explode — it is
  * Σ s·(s−1)/2 over CC cluster SIZES (clusters from
  * [[Dedup.connectedComponents]], the 100×-audited q40 machinery), so
  * a mega-cluster costs one aggregate row, not s² pairs. Every released
  * number is a scalar aggregate attached by broadcast crossJoin (the
  * tolerated one-row pattern).
  */
object BlockingQuality {

  /** One-row quality report for email/phone blocking over `records`
    * (`rid`, `email`, `phone`): candidate-pair counts per key and
    * combined, true transitive pairs, pairs completeness, reduction
    * ratio, and the transitive-only remainder.
    */
  def metrics(records: DataFrame): DataFrame = {
    def linkPairs(key: String): DataFrame =
      records.select(col(key).as("k"), col("rid").as("id_a"))
        .join(records.select(col(key).as("k"), col("rid").as("id_b")), Seq("k"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    // each leg feeds three consumers (its own count, the both-keys
    // semi-join, the candidate union) — materialize the pair-scale
    // frames once instead of re-deriving the registry joins per use
    val e = linkPairs("email").localCheckpoint()
    val p = linkPairs("phone").localCheckpoint()
    val cand = e.unionByName(p).distinct().localCheckpoint()
    val truth = Dedup.connectedComponents(cand)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("s"))
      .agg(coalesce(sum(col("s") * (col("s") - 1) / 2), lit(0L))
        .cast("long").as("n_truth_pairs"))
    val nE = e.agg(count(lit(1)).as("n_email_pairs"))
    val nP = p.agg(count(lit(1)).as("n_phone_pairs"))
    val nB = e.join(p, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_both_keys"))
    val nC = cand.agg(count(lit(1)).as("n_candidate_pairs"))
    val nR = records.agg(count(lit(1)).as("n_records"))
    nR.crossJoin(broadcast(nE)).crossJoin(broadcast(nP))
      .crossJoin(broadcast(nB)).crossJoin(broadcast(nC))
      .crossJoin(broadcast(truth))
      .withColumn("n_transitive_only",
        col("n_truth_pairs") - col("n_candidate_pairs"))
      .withColumn("pair_completeness",
        // 0/0 is UNDEFINED, not 1.0 — a linkless registry must read as
        // "no evidence", and under ANSI mode a bare divide would raise
        when(col("n_truth_pairs") > 0,
          round(col("n_candidate_pairs") * 1.0 / col("n_truth_pairs"), 6)))
      .withColumn("reduction_ratio",
        when(col("n_records") > 1,
          round(lit(1.0) - col("n_candidate_pairs") * 2.0
            / (col("n_records") * (col("n_records") - 1)), 6)))
  }

  /** q175: the q164 dirty registry's blocking scheme, graded. */
  def blockingQualityQuery(s: SparkSession, dir: String): DataFrame =
    metrics(GoldenRecord.dirtyRegistry(s, dir))
}
