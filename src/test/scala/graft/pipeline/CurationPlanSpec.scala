package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q214 — the unified curation plan's cross-operator consistency: the
  * plan is not a new pipeline, it is q200 + q48's cluster machinery +
  * q209 composed, so every slice of it must equal the operator it came
  * from, and the funnel must roll up from the flags bit-exactly.
  */
class CurationPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan() = CurationPlan.planQuery(spark, dir).localCheckpoint()

  test("rolling the plan's flags up reproduces q200's funnel exactly " +
    "(stages 1-4: doc and token counts and shares)") {
    val p = plan()
    val one = p.agg(
      count(lit(1)).as("d1"), sum(col("n_tokens")).as("t1"),
      sum(when(col("quality_pass") === 1L, 1L).otherwise(0L)).as("d2"),
      sum(when(col("quality_pass") === 1L, col("n_tokens"))
        .otherwise(0L)).as("t2"),
      sum(when(col("exact_keep") === 1L, 1L).otherwise(0L)).as("d3"),
      sum(when(col("exact_keep") === 1L, col("n_tokens"))
        .otherwise(0L)).as("t3"),
      sum(when(col("exact_keep") === 1L && col("contaminated") === 0L, 1L)
        .otherwise(0L)).as("d4"),
      sum(when(col("exact_keep") === 1L && col("contaminated") === 0L,
        col("n_tokens")).otherwise(0L)).as("t4")).collect()(0)
    val funnel = ReleaseFunnel.funnelQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(funnel(1L) == ((one.getLong(0), one.getLong(1))), "ingested")
    assert(funnel(2L) == ((one.getLong(2), one.getLong(3))), "quality_pass")
    assert(funnel(3L) == ((one.getLong(4), one.getLong(5))), "exact_dedup")
    assert(funnel(4L) == ((one.getLong(6), one.getLong(7))), "released")
  }

  test("the media slice IS q209: per corpus document, media_action and " +
    "modalities equal the media plan's row (or 'none' off-plan)") {
    val p = plan()
    val media = graft.multimodal.MediaDedup.mediaDedupPlanQuery(spark, dir)
      .select(col("doc_id"), col("action"), col("modalities"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    p.select(col("doc_id"), col("media_action"), col("media_modalities"))
      .collect().foreach { r =>
        val want = media.getOrElse(r.getLong(0), ("none", ""))
        assert((r.getString(1), r.getString(2)) == want,
          s"doc ${r.getLong(0)}: plan ${(r.getString(1), r.getString(2))} " +
            s"!= q209 $want")
      }
  }

  test("the near-dup slice IS the q40/q48 shared cluster view: " +
    "neardup_keep = 0 exactly for corpus docs that are non-representative " +
    "cluster members") {
    val p = plan()
    val nonReps = graft.dedup.Dedup.clustersShared(spark, dir)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val planDrops = p.filter(col("neardup_keep") === 0L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val corpusIds = p.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planDrops == (nonReps intersect corpusIds),
      s"plan-only ${(planDrops -- nonReps).take(3)}, " +
        s"cluster-only ${((nonReps intersect corpusIds) -- planDrops).take(3)}")
  }

  test("action and drop_stage are the sequential gating of the flags — " +
    "keep iff every stage passes, drop_stage = first failing stage") {
    val stages = Seq("quality", "exact_dedup", "decontamination",
      "near_dup", "media_dedup", "released")
    plan().collect().foreach { r =>
      val fails = Seq(
        r.getAs[Long]("quality_pass") == 0L,
        r.getAs[Long]("exact_keep") == 0L,
        r.getAs[Long]("contaminated") == 1L,
        r.getAs[Long]("neardup_keep") == 0L,
        r.getAs[String]("media_action") == "drop")
      val firstFail = fails.indexWhere(identity)
      val wantStage = if (firstFail < 0) "released" else stages(firstFail)
      assert(r.getAs[String]("drop_stage") == wantStage,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[String]("action")
        == (if (firstFail < 0) "keep" else "drop"),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
