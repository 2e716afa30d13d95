package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The media dedup PLAN — wires the perceptual legs into the text
  * suite's keeper machinery: union the image (q202, aHash Hamming ≤ 3),
  * audio (q204, energy-delta Hamming ≤ 3) and video (q210,
  * keyframe-set Jaccard ≥ 1/2) near-dup pair graphs, close them
  * transitively ([[Dedup.connectedComponents]] — the Kiveris
  * star-contraction the golden-record ER already rides), and
  * emit one keep/drop decision per clustered media row with the
  * cluster's evidence trail (which modalities linked it, how many
  * members). This is the list a curation job actually executes: the
  * pairs (q202/q204/q210) are evidence, the plan is the action.
  *
  * Keeper rule: smallest doc_id per component — the q24/q48 keeper
  * convention, and also the star-forest root, so `keeper` must equal
  * `cluster_id` (asserted in spec; computed independently here and in
  * the oracle so a CC label-convention drift would fail the hash gate
  * rather than hide).
  *
  * 100 TB shape: both pair generators are collision-sized band joins
  * (never n²); CC runs O(log n) star rounds on the PAIR graph (tiny —
  * near-dup density, not corpus size); the plan join is
  * component-keyed. Everything downstream of the hashes touches only
  * ids and labels.
  */
object MediaDedup {

  /** One-shot plan over an explicit corpus — specs bring their own
    * docs; the query path reads the memoized fingerprint tables.
    */
  def mediaDedupPlan(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    mediaDedupPlanFromTables(
      PerceptualHash.hashImages(spark,
        PerceptualHash.imageCorpus(spark, docs)).toDF(),
      AudioFingerprint.fingerprintClips(spark,
        AudioFingerprint.audioCorpus(spark, docs)).toDF(),
      VideoKeyframes.keyframes(spark,
        VideoKeyframes.videoCorpus(spark, docs)).toDF())
  }

  /** The plan over prebuilt per-modality fingerprint tables — what a
    * production store runs (fingerprints computed once at ingest; the
    * plan is pure id/label work downstream).
    */
  def mediaDedupPlanFromTables(imgHashes: DataFrame, audFps: DataFrame,
      vidKeyframes: DataFrame): DataFrame = {
    val img = PerceptualHash.nearDupPairs(imgHashes, maxHamming = 3)
      .select(col("id_a"), col("id_b"), lit("image").as("modality"))
    val aud = PerceptualHash.nearDupPairs(audFps, maxHamming = 3)
      .select(col("id_a"), col("id_b"), lit("audio").as("modality"))
    val vid = VideoKeyframes.videoNearDupPairs(vidKeyframes)
      .select(col("id_a"), col("id_b"), lit("video").as("modality"))
    val edges = img.unionByName(aud).unionByName(vid).localCheckpoint()

    val cc = Dedup.connectedComponents(
      edges.select(col("id_a"), col("id_b")))
    val members = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("keeper"))
    val mods = edges
      .join(cc.withColumnRenamed("doc_id", "id_a"), "id_a")
      .groupBy(col("cluster_id"))
      .agg(array_join(array_sort(collect_set(col("modality"))), ",")
        .as("modalities"))
    cc.join(members, "cluster_id").join(mods, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("keeper"),
        when(col("doc_id") === col("keeper"), lit("keep"))
          .otherwise(lit("drop")).as("action"),
        col("n_members"), col("modalities"))
      .orderBy(col("doc_id"))
  }

  /** q209: the executable media dedup plan over the documents-derived
    * image + audio corpora.
    */
  def mediaDedupPlanQuery(s: SparkSession, dir: String): DataFrame =
    mediaDedupPlanFromTables(
      PerceptualHash.hashTable(s, dir),
      AudioFingerprint.fingerprintTable(s, dir),
      VideoKeyframes.keyframeTable(s, dir))
}
