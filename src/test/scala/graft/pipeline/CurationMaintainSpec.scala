package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.multimodal.MediaDedup

/** q216 — incremental maintenance of the unified curation plan. The
  * laws: maintained ≡ the from-scratch q214 plan of the union (the
  * driver gate replays this via q214's oracle; the spec replays it
  * in-process on corpora where a batch MERGES existing clusters); the
  * kept leg is carried verbatim from the stored plan, never recomputed
  * (poison proof); untouched clusters keep their stored labels while a
  * batch edge merges others.
  */
class CurationMaintainSpec extends SparkSpec {

  import CurationMaintain.{BaseState, maintainPlanLegged}

  private def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def emptyEdges: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, String)].toDF("id_a", "id_b", "modality")
  }

  /** Hand-built text-only base state (media tiers empty) — the spec's
    * corpora carry no media payload columns.
    */
  private def mkState(base: DataFrame): BaseState = {
    val flags = ReleaseFunnel.curationFlags(base).localCheckpoint()
    val shAll = Dedup.shingles(base, CurationMaintain.K).localCheckpoint()
    val (dfAll, shCapped) = CurationMaintain.dfAndCapped(shAll)
    val shCorpus = shAll.join(flags.select(col("doc_id")), Seq("doc_id"),
      "left_semi")
    val (dfCorpus, shCorpusCapped) = CurationMaintain.dfAndCapped(shCorpus)
    val pairs = Dedup.jaccardPairs(base, CurationMaintain.K,
      CurationMaintain.JaccardThreshold, CurationMaintain.MaxDf)
      .localCheckpoint()
    val clusters = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b"))).localCheckpoint()
    val edges = emptyEdges.localCheckpoint()
    val mediaPlan = MediaDedup.planFromEdges(edges).localCheckpoint()
    val plan = CurationPlan.planFromFlags(flags, clusters, mediaPlan)
      .localCheckpoint()
    BaseState(flags, shAll, dfAll, shCapped, dfCorpus, shCorpusCapped,
      pairs, clusters, edges, mediaPlan, plan)
  }

  private def fromScratch(union: DataFrame): DataFrame =
    CurationPlan.planFromFlags(
      ReleaseFunnel.curationFlags(union),
      Dedup.connectedComponents(
        Dedup.jaccardPairs(union, CurationMaintain.K,
          CurationMaintain.JaccardThreshold, CurationMaintain.MaxDf)
          .select(col("id_a"), col("id_b"))),
      MediaDedup.planFromEdges(emptyEdges))

  private def planRowSet(df: DataFrame): Set[Seq[Any]] =
    df.select("doc_id", "n_tokens", "quality_pass", "exact_keep",
        "contaminated", "neardup_keep", "media_action", "media_modalities",
        "drop_stage", "action")
      .collect().toIndexedSeq.map(_.toSeq).toSet

  // two base clusters A={1,2}, B={3,4} (identical texts within each),
  // one far cluster C={14,15}; batch doc 25 (25 % 13 == 12) carries
  // A's text followed by B's → J(25, ·) = 0.25 against all four, so
  // the batch MERGES A and B (and itself) into one cluster labeled 1
  private val tA = "alpha beta gamma delta epsilon zeta"
  private val tB = "red green blue cyan magenta yellow"
  private val tC = "one two three four five six"
  private def baseDocs = docs2(
    1L -> tA, 2L -> tA, 3L -> tB, 4L -> tB, 14L -> tC, 15L -> tC)
  private def batchDoc = docs2(25L -> s"$tA $tB")
  private def docs2(rows: (Long, String)*): DataFrame =
    docs(rows.map { case (id, t) => (id, t, "srcA") }: _*)

  test("a batch doc merges two existing text clusters: merged members " +
    "are recomputed with the union labels, the untouched cluster is " +
    "kept, and the maintained plan equals the from-scratch union plan") {
    val st = mkState(baseDocs)
    val union = baseDocs.unionByName(batchDoc)
    val out = maintainPlanLegged(st, union, emptyEdges).localCheckpoint()
    val legs = out.select(col("doc_id"), col("leg")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(legs === Map(1L -> "recomputed", 2L -> "recomputed",
      3L -> "recomputed", 4L -> "recomputed", 25L -> "recomputed",
      14L -> "kept", 15L -> "kept"), legs)
    // the merge actually happened: docs 1..4 and 25 share one cluster
    // (label 1 = the min member), so only doc 1 keeps its neardup flag
    val nd = out.select(col("doc_id"), col("neardup_keep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nd === Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 25L -> 0L,
      14L -> 1L, 15L -> 0L), nd)
    assert(planRowSet(out.drop("leg")) === planRowSet(fromScratch(union)))
  }

  test("the kept leg is the stored plan, not a recompute: poisoned " +
    "rows for the untouched cluster survive verbatim while the merge " +
    "recomputes everything it touches") {
    val st0 = mkState(baseDocs)
    val poisoned = st0.plan
      .withColumn("n_tokens", when(col("doc_id") >= 14L, lit(999L))
        .otherwise(col("n_tokens")))
      .localCheckpoint()
    val st = st0.copy(plan = poisoned)
    val out = maintainPlanLegged(st, baseDocs.unionByName(batchDoc),
      emptyEdges)
    val nt = out.select(col("doc_id"), col("n_tokens"), col("leg"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(nt(14L) === ((999L, "kept")), nt)
    assert(nt(15L) === ((999L, "kept")), nt)
    // the recomputed leg reads the maintained tier views, not the
    // poisoned plan — doc 1's tokens are its real count
    assert(nt(1L)._1 === 6L, nt)
  }

  test("a batch near-dup that does NOT merge clusters dirties only " +
    "its own neighborhood; an exact text re-ingest dirties only its " +
    "text group") {
    // batch doc 12 (12 % 13 == 12) duplicates cluster C's text EXACTLY:
    // the exact-keeper group {14, 15, 12} is recomputed (12 becomes the
    // min-id keeper candidate among passers — all fail quality here, so
    // keep stays false) and C's cluster gains a member; A and B stay
    // kept
    val st = mkState(baseDocs)
    val union = baseDocs.unionByName(docs2(12L -> tC))
    val out = maintainPlanLegged(st, union, emptyEdges).localCheckpoint()
    val legs = out.select(col("doc_id"), col("leg")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(legs === Map(1L -> "kept", 2L -> "kept", 3L -> "kept",
      4L -> "kept", 12L -> "recomputed", 14L -> "recomputed",
      15L -> "recomputed"), legs)
    // cluster C relabeled to its new min member 12
    val nd = out.filter(col("doc_id").isin(12L, 14L, 15L))
      .select(col("doc_id"), col("neardup_keep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nd === Map(12L -> 1L, 14L -> 0L, 15L -> 0L), nd)
    assert(planRowSet(out.drop("leg")) === planRowSet(fromScratch(union)))
  }

  test("the q216 driver surface at sf0.001: both legs populated, " +
    "maintained equals q214's from-scratch plan bit-exactly") {
    val dir = "/root/testdata/sf0.001"
    val st = CurationMaintain.baseStateShared(spark, dir)
    val unionEdges = MediaDedup.planShared(spark, dir)._1
    val out = maintainPlanLegged(st,
      graft.Tables.documents(spark, dir), unionEdges).localCheckpoint()
    val legs = out.groupBy(col("leg")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(legs.getOrElse("kept", 0L) > 0, legs)
    assert(legs.getOrElse("recomputed", 0L) > 0, legs)
    assert(planRowSet(out.drop("leg"))
      === planRowSet(CurationPlan.planQuery(spark, dir)))
  }
}
