package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.MediaDedup

/** The UNIFIED curation plan — text and media curation composed into
  * the one corpus-wide, per-document artifact a 100 TB curation job
  * actually executes. q48 (text keep/drop), q200 (release funnel
  * counts) and q209 (media keep/drop) are separate readouts of
  * separate tiers; this emits one row per corpus document carrying
  * every gate's evidence and the FIRST-FAILING-STAGE attribution:
  *
  *   1. quality        — q112/q200's rule battery (`QualityRules`)
  *   2. exact dedup    — q200's passer-scoped min-id keeper
  *   3. decontamination— q53/q200's benchmark containment screen
  *   4. text near-dup  — q40/q48's shared Jaccard cluster keeper
  *   5. media dedup    — q209's 3-modality perceptual plan
  *
  * Every stage flag is computed INDEPENDENTLY over its own universe
  * (the q48 discipline: dedup decisions must not depend on what the
  * gate removed), then the sequential gating is pure per-row logic —
  * so the plan is simultaneously the audit trail (roll the flags up
  * and you get q200's funnel bit-exactly, extended by two stages;
  * CurationPlanSpec pins it) and the executable decision list
  * (`action`), with `drop_stage` attributing every lost document to
  * the stage that killed it.
  *
  * Exactness: flags are 0/1 BIGINTs, stages are strings — no floats
  * anywhere, so the DuckDB oracle replays the whole composition
  * hash-exactly.
  *
  * 100 TB shape: nothing new — every stage is an already-verified
  * operator reused on its own already-audited plan shape (one corpus
  * scan feeds quality + keeper window; contamination is the df-capped
  * blocked containment join; clusters and the media plan come from the
  * shared memoized views, id-keyed joins only downstream). The
  * composition itself adds three doc_id-keyed left joins.
  */
object CurationPlan {

  /** The plan over explicit cluster/media views — spec path. */
  def plan(docs: DataFrame, clusters: DataFrame,
      mediaPlan: DataFrame): DataFrame =
    planFromFlags(ReleaseFunnel.curationFlags(docs), clusters, mediaPlan)

  /** The plan over a prebuilt flag table ([[ReleaseFunnel
    * .curationFlags]] — the same evidence q200 rolls up): pure
    * doc_id-keyed composition.
    */
  def planFromFlags(flagged: DataFrame, clusters: DataFrame,
      mediaPlan: DataFrame): DataFrame = {
    def bit(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c, 1L).otherwise(0L)
    flagged
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .join(mediaPlan.select(col("doc_id"),
        col("action").as("media_action0"),
        col("modalities").as("media_modalities0")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        bit(col("pass")).as("quality_pass"),
        bit(col("keep")).as("exact_keep"),
        bit(col("contaminated")).as("contaminated"),
        bit(col("cluster_id").isNull
          || col("cluster_id") === col("doc_id")).as("neardup_keep"),
        // 'none' = the document sits in no media near-dup cluster —
        // media curation has no opinion, the text tiers decide alone
        coalesce(col("media_action0"), lit("none")).as("media_action"),
        coalesce(col("media_modalities0"), lit("")).as("media_modalities"))
      .withColumn("drop_stage",
        when(col("quality_pass") === 0L, "quality")
          .when(col("exact_keep") === 0L, "exact_dedup")
          .when(col("contaminated") === 1L, "decontamination")
          .when(col("neardup_keep") === 0L, "near_dup")
          .when(col("media_action") === "drop", "media_dedup")
          .otherwise("released"))
      .withColumn("action",
        when(col("drop_stage") === "released", "keep").otherwise("drop"))
      .orderBy(col("doc_id"))
  }

  /** q214: the unified plan off the SHARED views — the text-curation
    * flag table q200 rolls up, the cluster table q40/q48/q111 read,
    * and the media fingerprint tables q202–q210 read — so a bench
    * session prices the composition (three doc_id-keyed joins + the
    * stage logic), not a rebuild of any tier.
    */
  def planQuery(s: SparkSession, dir: String): DataFrame =
    planFromFlags(ReleaseFunnel.curationFlagsShared(s, dir),
      Dedup.clustersShared(s, dir),
      MediaDedup.planShared(s, dir)._2)
}
