package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.{AudioFingerprint, MediaDedup, PerceptualHash,
  VideoKeyframes}
import graft.text.QualityRules
import graft.tools.CorpusMemo

/** INCREMENTAL maintenance of the UNIFIED curation plan (q214) — the
  * q213 maintenance discipline lifted to the plan grain: a production
  * pipeline does not recompute the corpus-wide keep/drop artifact per
  * ingest batch; it maintains it, recomputing ONLY the rows a batch
  * can actually change and carrying every other row verbatim from the
  * stored plan. Each of q214's five stages has its own dirty scope,
  * each justified by its own theorem:
  *
  *   1. quality — per-row (a doc's flags depend only on its own text):
  *      batch rows are new work, base rows NEVER change.
  *   2. exact keeper — text-group-scoped: only groups whose text the
  *      batch touches can change their passer-scoped min-id keeper.
  *   3. decontamination — the q213 cap-crossing theorem on the
  *      containment screen's corpus-side df cap: a batch can push a
  *      corpus shingle over maxDf and retroactively shrink base docs'
  *      capped sets; dirty = batch ∪ base docs holding a crossing
  *      shingle (the benchmark side is FIXED — an ingest stream
  *      delivers training docs, not benchmarks).
  *   4. text near-dup clusters — two layers: the PAIR view maintains
  *      exactly like q213 (kept pairs clean-clean, recomputed pairs
  *      dirty-adjacent, same crossing theorem at k=5/df=100 with the
  *      q40 rounded-Jaccard threshold), then CC relabels ONLY
  *      components adjacent to a changed pair — a batch edge can MERGE
  *      two existing clusters, and every base component absorbed into
  *      a changed union component is provably adjacent to some changed
  *      pair, so the scoped relabel reproduces the union labels
  *      exactly while untouched components keep their stored labels
  *      (the poisoned-kept-leg spec pins this).
  *   5. media dedup — the q217 insert mirror: media evidence is
  *      pairwise, so base–base edges never change; new (batch-
  *      adjacent) edges can only merge or extend clusters, dirty =
  *      clusters adjacent to a new edge.
  *
  * THE LAW (what the q216 oracle gates): maintained ≡ the from-scratch
  * q214 plan of the union corpus. The oracle is q214's SQL VERBATIM —
  * hash equality at the gate is the maintenance theorem at the plan
  * grain. The kept/recomputed split is engine-internal (exposed to the
  * spec via [[maintainPlanLegged]]); putting it in the gate would
  * force the oracle to replay the whole dirty-scoping machinery for
  * no extra coverage of the theorem.
  *
  * 100 TB shape: per ingest batch, new work is batch-sized flag
  * computation, dirty-group keeper windows, crossing-bucket-scoped
  * containment and pair recomputes, CC on changed components' subgraph
  * only, and id-keyed anti/semi joins against stored state — never a
  * corpus re-AGGREGATE: the df tables and capped inverted indexes are
  * STATE (built once per corpus lifetime), so a run's union df is a
  * batch-sized join against the stored df table (a shingle can cross
  * the cap only if the batch raised its df) and the capped-union view
  * is the stored capped index ± tiny crossing anti-joins. The stored
  * base state is memoized per corpus here (the bench prices
  * maintenance at the margin, the q213 rationale); a deployment would
  * persist it through the snapshot chain exactly like the q213/q215
  * index state.
  *
  * DEGENERATE LIMIT (measured, SCALING.md round 15): the scopes are
  * tight, but the work they admit is corpus-shaped — on the synthetic
  * 100× corpus every document sits in a ~100-sibling near-dup cluster,
  * so a ~8% batch is adjacent to ~every cluster and the relabel scope
  * covers 99% of the plan (measured legs: 16.6% recomputed at sf0.1,
  * 37% at 10×, 99% at 100×). That is the maintenance theorem
  * operating at its limit, not a scoping bug; a production deployment
  * would add the obvious cost-based switch (dirty fraction above a
  * threshold → rebuild from scratch and skip the kept-leg machinery).
  */
object CurationMaintain {

  /** source ≠ src0 AND doc_id % BatchMod == BatchMod−1 is the "new
    * ingest batch" (~8% of the corpus): training documents arrive,
    * benchmarks (src0) are a fixed reference set. 13 is coprime to the
    * q213 (%7), q215 (%9) and q217 (%11) slices.
    */
  val BatchMod = 13L

  val K = 5
  val MaxDf = 100
  val JaccardThreshold = 0.2
  val ContainThreshold = 0.5

  def isBatch: org.apache.spark.sql.Column =
    col("source") =!= "src0" && col("doc_id") % BatchMod === BatchMod - 1

  /** The stored base state a production deployment holds — every tier's
    * serving artifact plus the inverted-index tables maintenance needs
    * for dirty-scoping: the uncapped shingle index (the erasure
    * sibling's requirement, as in q213's packed snapshot), the df
    * tables, and the CAPPED indexes per universe — df and capped views
    * are state so a maintenance run never re-aggregates the corpus.
    */
  final case class BaseState(
      flags: DataFrame, // (doc_id, n_tokens, pass, keep, contaminated)
      shAll: DataFrame, // uncapped distinct (doc_id, shingle), ALL base docs
      dfAll: DataFrame, // (shingle, base_df) over ALL base docs
      shCapped: DataFrame, // shAll minus over-cap shingles' rows
      dfCorpus: DataFrame, // (shingle, base_df), corpus (non-src0) docs
      shCorpusCapped: DataFrame, // corpus rows under the CORPUS-side cap
      pairs: DataFrame, // stored q40 pair view (id_a, id_b, jaccard)
      clusters: DataFrame, // stored CC (doc_id, cluster_id)
      mediaEdges: DataFrame, // (id_a, id_b, modality), base media
      mediaPlan: DataFrame, // stored q209 plan rows over base
      plan: DataFrame) // the stored q214 plan over base

  private val stateMemo = new CorpusMemo[BaseState](st => Seq(st.flags,
    st.shAll, st.dfAll, st.shCapped, st.dfCorpus, st.shCorpusCapped,
    st.pairs, st.clusters, st.mediaEdges, st.mediaPlan, st.plan))

  /** (df table, capped index) for one universe — stored state, so a
    * maintenance run never re-aggregates the corpus (the sf10 profile
    * had two full-shingle groupBys + a corpus-scale capped-union
    * checkpoint per run, ~70 s of the leg; production keeps both in
    * the snapshot exactly like q213's packed state).
    */
  private[pipeline] def dfAndCapped(sh: DataFrame): (DataFrame, DataFrame) = {
    val df = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("base_df")).localCheckpoint()
    val capped = sh.join(df.filter(col("base_df") <= MaxDf)
        .select(col("shingle")), Seq("shingle"), "left_semi")
      .localCheckpoint()
    (df, capped)
  }

  def buildBaseState(s: SparkSession, base: DataFrame): BaseState = {
    val b = base.localCheckpoint()
    val flags = ReleaseFunnel.curationFlags(b).localCheckpoint()
    val shAll = Dedup.shingles(b, K).localCheckpoint()
    val (dfAll, shCapped) = dfAndCapped(shAll)
    val shCorpus = shAll.join(flags.select(col("doc_id")), Seq("doc_id"),
      "left_semi")
    val (dfCorpus, shCorpusCapped) = dfAndCapped(shCorpus)
    val pairs = Dedup.jaccardPairs(b, K, JaccardThreshold, MaxDf)
      .localCheckpoint()
    val clusters = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b"))).localCheckpoint()
    val mediaEdges = MediaDedup.modalityEdges(
      PerceptualHash.hashImages(s, PerceptualHash.imageCorpus(s, b)).toDF(),
      AudioFingerprint.fingerprintClips(s,
        AudioFingerprint.audioCorpus(s, b)).toDF(),
      VideoKeyframes.keyframes(s, VideoKeyframes.videoCorpus(s, b)).toDF())
      .localCheckpoint()
    val mediaPlan = MediaDedup.planFromEdges(mediaEdges).localCheckpoint()
    val plan = CurationPlan.planFromFlags(flags, clusters, mediaPlan)
      .localCheckpoint()
    BaseState(flags, shAll, dfAll, shCapped, dfCorpus, shCorpusCapped,
      pairs, clusters, mediaEdges, mediaPlan, plan)
  }

  def baseStateShared(s: SparkSession, dir: String): BaseState =
    stateMemo.get(s, dir) {
      buildBaseState(s, Tables.documents(s, dir).filter(!isBatch))
    }

  private def ends(p: DataFrame): DataFrame =
    p.select(col("id_a").as("doc_id"))
      .unionByName(p.select(col("id_b").as("doc_id")))

  /** One maintenance step: the maintained plan over base state + one
    * ingest batch, leg-tagged (kept = carried verbatim from
    * `st.plan`; recomputed = rebuilt from the maintained tier views).
    * `unionMediaEdges` is the cross-modality edge list over the UNION
    * fingerprint tables (base–base rows are bit-identical to
    * `st.mediaEdges` — media evidence is pairwise — so only its
    * batch-adjacent rows are consulted as new edges; the query path
    * reads it from the q209/q217-shared memo at zero marginal cost).
    */
  def maintainPlanLegged(st: BaseState, docs: DataFrame,
      unionMediaEdges: DataFrame): DataFrame = {
    val batch = docs.filter(isBatch).localCheckpoint()
    val batchIds = batch.select(col("doc_id"))
    val corpusU = docs.filter(col("source") =!= "src0")
    val evalSet = docs.filter(col("source") === "src0")

    // The five tiers are INDEPENDENT given `batch` (tiers 3 and 4 also
    // share the batch shingle table): each is a chain of eager
    // `localCheckpoint` materializations plus (tiers 4/5) a CC loop, and
    // running them sequentially left the cluster idle through every
    // chain's tail. Overlap them from the driver (guide §2.6): tier 1+2
    // and tier 5 run beside the shingle-table build, then the two
    // shingle consumers (tier 3, tier 4) run beside each other. The
    // dataflow below is the sequential body verbatim, only grouped.
    val ((qAll, exactDirtyIds, keepAll), (scopeMedia, mediaU),
        ((contamDirty, contamAll), (scopeText, clustersU))) =
      graft.tools.Overlap.par3(
      {
        // ---- tier 1+2: quality (batch-only new work) + dirty-group keeper
        val qAll = st.flags.select(col("doc_id"), col("n_tokens"), col("pass"))
          .unionByName(QualityRules.qualityFlags(batch)
            .select(col("doc_id"), col("n_tokens"), col("pass")))
          .localCheckpoint()
        val dirtyGroup = corpusU.select(col("doc_id"), col("text"))
          .join(batch.select(col("text")).distinct(), Seq("text"), "left_semi")
        val exactDirtyIds = dirtyGroup.select(col("doc_id")).localCheckpoint()
        val keepRecomp = dirtyGroup
          .join(qAll.select(col("doc_id"), col("pass")), Seq("doc_id"))
          .withColumn("keeper",
            min(when(col("pass"), col("doc_id")))
              .over(Window.partitionBy(col("text"))))
          .select(col("doc_id"),
            (col("pass") && col("doc_id") === col("keeper")).as("keep"))
        val keepAll = st.flags.join(exactDirtyIds, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("keep"))
          .unionByName(keepRecomp)
        (qAll, exactDirtyIds, keepAll)
      },
      {
        // ---- tier 5: media — the q217 insert mirror
        val newMedia = unionMediaEdges
          .join(batchIds.select(col("doc_id").as("id_a")), Seq("id_a"),
            "left_semi")
          .unionByName(unionMediaEdges
            .join(batchIds.select(col("doc_id").as("id_b")), Seq("id_b"),
              "left_semi"))
          .distinct().localCheckpoint()
        val newEnds = ends(newMedia).distinct()
        val dirtyMediaClusters = st.mediaPlan.join(newEnds, Seq("doc_id"),
            "left_semi")
          .select(col("cluster_id")).distinct()
        val scopeMedia = st.mediaPlan
          .join(dirtyMediaClusters, Seq("cluster_id"), "left_semi")
          .select(col("doc_id")).unionByName(newEnds).distinct()
          .localCheckpoint()
        val mediaU = st.mediaPlan
          .join(dirtyMediaClusters, Seq("cluster_id"), "left_anti")
          .select(col("doc_id"), col("cluster_id"), col("keeper"),
            col("action"), col("n_members"), col("modalities"))
          .unionByName(MediaDedup.planFromEdges(st.mediaEdges
            .join(scopeMedia.select(col("doc_id").as("id_a")), Seq("id_a"),
              "left_semi")
            .unionByName(newMedia)))
        (scopeMedia, mediaU)
      },
      {
        val shBatch = Dedup.shingles(batch, K).localCheckpoint()
        val dfBatch = shBatch.groupBy(col("shingle"))
          .agg(count(lit(1)).as("batch_df"))
        def batchUnionDf(dfStored: DataFrame): DataFrame =
          dfBatch.join(dfStored, Seq("shingle"), "left_outer")
            .select(col("shingle"),
              coalesce(col("base_df"), lit(0L)).as("base_df"),
              (coalesce(col("base_df"), lit(0L)) + col("batch_df")).as("df"))
            .localCheckpoint()
        graft.tools.Overlap.par2(
        {
          // ---- tier 3: decontamination — corpus-side df cap crossings. A
          // shingle can CROSS only if the batch raised its df, so the union
          // df is computed for BATCH shingles only (batch-sized join against
          // the STORED df table — never a corpus re-aggregate), and the
          // capped-union view is assembled dirty-scoped from the STORED
          // capped index: dirty docs' stored rows minus newly-over-cap
          // shingles, plus the batch's under-cap rows.
          val dfCU = batchUnionDf(st.dfCorpus)
          val crossingC = dfCU.filter(col("base_df") <= MaxDf
              && col("df") > MaxDf)
            .select(col("shingle"))
          // crossing shingles were under the cap in base, so their base rows
          // live in the STORED capped index — the semi is complete
          val contamDirty = st.shCorpusCapped.join(crossingC, Seq("shingle"),
              "left_semi")
            .select(col("doc_id")).unionByName(batchIds).distinct()
            .localCheckpoint()
          val overCapC = dfCU.filter(col("df") > MaxDf).select(col("shingle"))
          val shCU = st.shCorpusCapped.join(crossingC, Seq("shingle"),
              "left_anti")
            .unionByName(shBatch.join(overCapC, Seq("shingle"), "left_anti"))
          val shE = Dedup.shingles(evalSet, K).localCheckpoint()
          val evalSizes = shE.groupBy(col("doc_id").as("eval_id"))
            .agg(count(lit(1)).as("n_eval_sh"))
          val contamRecompIds = shCU.join(contamDirty, Seq("doc_id"),
              "left_semi")
            .as("c")
            .join(shE.as("e"), col("c.shingle") === col("e.shingle"))
            .groupBy(col("c.doc_id").as("doc_id"),
              col("e.doc_id").as("eval_id"))
            .agg(count(lit(1)).as("n_common"))
            .join(evalSizes, "eval_id")
            .filter(round(col("n_common").cast("double") / col("n_eval_sh"), 4)
              >= ContainThreshold)
            .select(col("doc_id")).distinct()
          val contamAll = st.flags.join(contamDirty, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("contaminated"))
            .unionByName(contamDirty
              .join(contamRecompIds.withColumn("c2", lit(true)), Seq("doc_id"),
                "left")
              .select(col("doc_id"),
                coalesce(col("c2"), lit(false)).as("contaminated")))
          (contamDirty, contamAll)
        },
        {
          // ---- tier 4: the pair view maintains like q213, then the scoped
          // CC relabel (only components adjacent to a changed pair). Same
          // stored-state discipline as tier 3: batch-scoped union df,
          // capped-union view assembled from the stored capped index with a
          // tiny crossing anti-join — the only corpus-scale work left is the
          // dirty×clean candidate join through the inverted index itself.
          val dfAU = batchUnionDf(st.dfAll)
          val crossingA = dfAU.filter(col("base_df") <= MaxDf
              && col("df") > MaxDf)
            .select(col("shingle"))
          val dirtyDocsA = st.shCapped.join(crossingA, Seq("shingle"),
              "left_semi")
            .select(col("doc_id")).unionByName(batchIds).distinct()
            .localCheckpoint()
          val overCapA = dfAU.filter(col("df") > MaxDf).select(col("shingle"))
          val shAUbase = st.shCapped.join(crossingA, Seq("shingle"),
            "left_anti")
          val shBatchCapped = shBatch.join(overCapA, Seq("shingle"),
            "left_anti")
          // batch docs are all dirty, so the clean side is base-only; the
          // dirty side is dirty base rows ∪ the batch's under-cap rows
          val shD = shAUbase.join(dirtyDocsA, Seq("doc_id"), "left_semi")
            .unionByName(shBatchCapped)
          val shC2 = shAUbase.join(dirtyDocsA, Seq("doc_id"), "left_anti")
          val dc = shD.as("a").join(shC2.as("b"),
              col("a.shingle") === col("b.shingle"))
            .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
          val dd = shD.as("a").join(shD.as("b"),
              col("a.shingle") === col("b.shingle")
                && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          val common = dc.unionByName(dd)
            .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
          val participants = common.select(col("id_a").as("doc_id"))
            .unionByName(common.select(col("id_b").as("doc_id"))).distinct()
          val sizes = shAUbase.unionByName(shBatchCapped)
            .join(participants, Seq("doc_id"), "left_semi")
            .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
          // the q40 threshold semantics VERBATIM (rounded quotient, not the
          // q213 integer test — the stored view is q40's)
          val recompPairs = common
            .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")),
              Seq("id_a"))
            .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")),
              Seq("id_b"))
            .withColumn("jaccard", round(col("n_common").cast("double")
              / (col("n_a") + col("n_b") - col("n_common")), 4))
            .filter(col("jaccard") >= JaccardThreshold)
            .select(col("id_a"), col("id_b"), col("jaccard"))
            .localCheckpoint()
          val keptPairs = st.pairs
            .join(dirtyDocsA.select(col("doc_id").as("id_a")), Seq("id_a"),
              "left_anti")
            .join(dirtyDocsA.select(col("doc_id").as("id_b")), Seq("id_b"),
              "left_anti")
          val maintainedPairs = keptPairs.unionByName(recompPairs)
            .localCheckpoint()
          // changed pairs = recomputed ∪ stored-with-a-dirty-endpoint; every
          // base component merged/split by the batch touches one of their
          // endpoints, so this is the exact relabel frontier
          val storedChanged = st.pairs
            .join(dirtyDocsA.select(col("doc_id").as("id_a")), Seq("id_a"),
              "left_semi")
            .unionByName(st.pairs
              .join(dirtyDocsA.select(col("doc_id").as("id_b")), Seq("id_b"),
                "left_semi"))
          val changedEnds = ends(recompPairs).unionByName(ends(storedChanged))
            .distinct().localCheckpoint()
          val dirtyClusterIds = st.clusters.join(changedEnds, Seq("doc_id"),
              "left_semi")
            .select(col("cluster_id")).distinct()
          val scopeText = st.clusters.join(dirtyClusterIds, Seq("cluster_id"),
              "left_semi")
            .select(col("doc_id")).unionByName(changedEnds).distinct()
            .localCheckpoint()
          val clustersU = st.clusters
            .join(dirtyClusterIds, Seq("cluster_id"), "left_anti")
            .unionByName(Dedup.connectedComponents(maintainedPairs
              .join(scopeText.select(col("doc_id").as("id_a")), Seq("id_a"),
                "left_semi")
              .select(col("id_a"), col("id_b"))))
          (scopeText, clustersU)
        })
      })
    val flagsU = qAll.join(keepAll, Seq("doc_id"))
      .join(contamAll, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("pass"), col("keep"),
        col("contaminated"))

    // ---- compose: recompute the union of every tier's dirty scope,
    // carry everything else verbatim from the stored plan
    val recomputedDocs = batchIds.unionByName(exactDirtyIds)
      .unionByName(contamDirty).unionByName(scopeText)
      .unionByName(scopeMedia).distinct().localCheckpoint()
    val kept = st.plan.join(recomputedDocs, Seq("doc_id"), "left_anti")
      .withColumn("leg", lit("kept"))
    val recomputed = CurationPlan.planFromFlags(
        flagsU.join(recomputedDocs, Seq("doc_id"), "left_semi"),
        clustersU, mediaU)
      .withColumn("leg", lit("recomputed"))
    kept.unionByName(recomputed)
  }

  /** q216: the maintained q214 plan — stored base state + the %13
    * ingest batch, gated against q214's from-scratch oracle on the
    * union. Same output shape as q214 (the leg is spec-surface only).
    */
  def maintainQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val st = baseStateShared(s, dir)
    val unionEdges = MediaDedup.planShared(s, dir)._1
    maintainPlanLegged(st, docs, unionEdges)
      .drop("leg").orderBy(col("doc_id"))
  }
}
