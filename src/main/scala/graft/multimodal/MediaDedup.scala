package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.tools.CorpusMemo

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

  /** The cross-modality near-dup edge list over prebuilt fingerprint
    * tables: (id_a, id_b, modality) with id_a < id_b per generator.
    */
  def modalityEdges(imgHashes: DataFrame, audFps: DataFrame,
      vidKeyframes: DataFrame): DataFrame = {
    val img = PerceptualHash.nearDupPairs(imgHashes, maxHamming = 3)
      .select(col("id_a"), col("id_b"), lit("image").as("modality"))
    val aud = PerceptualHash.nearDupPairs(audFps, maxHamming = 3)
      .select(col("id_a"), col("id_b"), lit("audio").as("modality"))
    val vid = VideoKeyframes.videoNearDupPairs(vidKeyframes)
      .select(col("id_a"), col("id_b"), lit("video").as("modality"))
    img.unionByName(aud).unionByName(vid)
  }

  /** The plan rows for one edge set: transitive closure, then the
    * keeper/action/evidence rollup per clustered doc. Unordered —
    * callers sort (the maintenance path interleaves legs first).
    */
  def planFromEdges(edges: DataFrame): DataFrame = {
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
  }

  /** The plan over prebuilt per-modality fingerprint tables — what a
    * production store runs (fingerprints computed once at ingest; the
    * plan is pure id/label work downstream).
    */
  def mediaDedupPlanFromTables(imgHashes: DataFrame, audFps: DataFrame,
      vidKeyframes: DataFrame): DataFrame =
    planFromEdges(modalityEdges(imgHashes, audFps, vidKeyframes)
      .localCheckpoint())
      .orderBy(col("doc_id"))

  /** The memoized (edges, stored plan) pair per corpus — the state a
    * production deployment keeps (fingerprints → edges at ingest, the
    * plan as the serving artifact). q209 reads the plan; q217's
    * erasure maintains it. Memo-vs-rebuild is row-identical: the pair
    * generators are deterministic and CC is min-label.
    */
  private val planMemo = new CorpusMemo[(DataFrame, DataFrame)](
    p => Seq(p._1, p._2))

  def planShared(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    planMemo.get(s, dir) {
      val edges = modalityEdges(
        PerceptualHash.hashTable(s, dir),
        AudioFingerprint.fingerprintTable(s, dir),
        VideoKeyframes.keyframeTable(s, dir)).localCheckpoint()
      (edges, planFromEdges(edges).localCheckpoint())
    }

  /** q209: the executable media dedup plan over the documents-derived
    * image + audio + video corpora.
    */
  def mediaDedupPlanQuery(s: SparkSession, dir: String): DataFrame =
    planShared(s, dir)._2.orderBy(col("doc_id"))

  // ---------------------------------------------------------------------
  // DELETION maintenance — the erasure leg of the media plan. Deleting
  // clips removes NODES from the pair graph: surviving pair evidence is
  // pairwise (an edge depends only on its two fingerprints), so edges
  // between survivors are untouched, and components can only SPLIT or
  // SHRINK — never merge. The maintenance is therefore cluster-scoped:
  // only components that LOST a member are recomputed (a removed clip
  // can split its cluster or hand the min-id keeper to another member);
  // every untouched cluster's rows are carried verbatim from the stored
  // plan.
  // ---------------------------------------------------------------------

  /** doc_id % DeleteMod == DeleteMod−1 is the q217 "erasure batch".
    * 11 is coprime to the corpus' modality id lattices, so the slice
    * cuts across image/audio/video clusters rather than along one.
    */
  val DeleteMod = 11L

  /** One DELETION maintenance step over the stored plan:
    *
    *   - dirty clusters = stored clusters holding a deleted doc;
    *   - KEPT: stored rows of untouched clusters, verbatim — exact
    *     because no edge among their members changed (edges are
    *     pairwise; node removal can never merge components);
    *   - RECOMPUTED: the plan rebuilt from the SURVIVOR edges of dirty
    *     clusters only (an edge's endpoints share a cluster, so the
    *     id_a-side membership semi-join captures the whole subgraph).
    *     Members that lose every edge leave the plan — a singleton is
    *     not clustered media.
    *
    * LAW (the q217 oracle): maintained ≡ the from-scratch plan over
    * corpus ∖ deleted.
    *
    * 100 TB shape: the dirty scope is |deleted docs' clusters|, the CC
    * re-runs on those clusters' survivor subgraph only, and the kept
    * leg is one cluster-keyed anti-join on the stored plan — never a
    * full-graph reclosure.
    */
  def maintainPlanDelete(storedPlan: DataFrame, edges: DataFrame,
      delIds: DataFrame): DataFrame = {
    val dirtyClusters = storedPlan.join(delIds, Seq("doc_id"), "left_semi")
      .select(col("cluster_id")).distinct()
      .localCheckpoint()
    val kept = storedPlan
      .join(dirtyClusters, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"), col("keeper"),
        col("action"), col("n_members"), col("modalities"),
        lit("kept").as("leg"))
    val dirtyDocs = storedPlan
      .join(dirtyClusters, Seq("cluster_id"), "left_semi")
      .select(col("doc_id"))
    val survEdges = edges
      .join(dirtyDocs.select(col("doc_id").as("id_a")), Seq("id_a"),
        "left_semi")
      .join(delIds.select(col("doc_id").as("id_a")), Seq("id_a"),
        "left_anti")
      .join(delIds.select(col("doc_id").as("id_b")), Seq("id_b"),
        "left_anti")
      .localCheckpoint()
    val recomputed = planFromEdges(survEdges)
      .withColumn("leg", lit("recomputed"))
    kept.unionByName(recomputed).orderBy(col("doc_id"))
  }

  /** q217: maintain the media dedup plan through one ERASURE batch
    * (the %[[DeleteMod]] slice) — the maintained (kept ∪ recomputed)
    * plan over the surviving clips, leg-tagged. The oracle recomputes
    * the survivor plan from scratch AND re-derives the leg from the
    * full-corpus clusters independently; hash equality proves the
    * erasure exact — splits, keeper handoffs, evaporated singletons
    * and all. Reads the same memoized (edges, plan) state as q209.
    */
  def mediaDeleteQuery(s: SparkSession, dir: String): DataFrame = {
    val (edges, stored) = planShared(s, dir)
    val delIds = stored.filter(col("doc_id") % DeleteMod === DeleteMod - 1)
      .select(col("doc_id"))
    maintainPlanDelete(stored, edges, delIds)
  }
}
