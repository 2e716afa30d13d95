package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Media-dedup-plan contracts: the plan's clusters are exactly the
  * planted near-dup pairs — image/audio groups at (4k, 4k+1), video
  * splice groups at (4k+2, 4k+3) — with no cross-group chaining
  * (fresh media land ~32 bits / disjoint hash sets away), the keeper
  * convention (smallest id; equals the star-forest root label) holds
  * on every row, actions partition each cluster into one keep +
  * drops, and each planted family carries ITS modality evidence
  * (video clusters say "video", image/audio clusters never do).
  */
class MediaDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q209: clusters are exactly planted pairs, keeper law holds, " +
    "per-family modality evidence, union recall beats the floor") {
    val rows = MediaDedup
      .mediaDedupPlanQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, cluster, keeper, action, n, mods) =>
      assert(keeper === cluster, s"keeper $keeper != cluster label $cluster")
      assert(n === 2L, s"cluster $cluster has $n members (chained?)")
      assert(keeper % 4 === 0L || keeper % 4 === 2L,
        s"keeper $keeper not a planted base")
      assert(doc === keeper || doc === keeper + 1, s"un-planted member $doc")
      assert(if (doc == keeper) action == "keep" else action == "drop")
      if (keeper % 4 == 0L)
        assert(Set("image", "audio", "audio,image")(mods),
          s"image/audio group $keeper carries '$mods'")
      else
        assert(mods === "video", s"video group $keeper carries '$mods'")
    }
    // each cluster contributes exactly one keep and one drop
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.map(_._4).sorted.toSeq === Seq("drop", "keep"), s"cluster $c")
    }
    // recall per planted family
    val nDocs = graft.Tables.documents(spark, dir)
      .select(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val iaGroups = (0L until nDocs by 4L).count(_ + 1 < nDocs)
    val vGroups = (2L until nDocs by 4L).count(_ + 1 < nDocs)
    val iaFound = byCluster.keySet.count(_ % 4 == 0L)
    val vFound = byCluster.keySet.count(_ % 4 == 2L)
    assert(iaFound.toDouble / iaGroups >= 0.95,
      s"image+audio union recall $iaFound/$iaGroups")
    assert(vFound.toDouble / vGroups >= 0.9,
      s"video recall $vFound/$vGroups")
    // the two-leg union beats either single modality where they overlap
    val allMods = rows.map(_._6).toSet
    assert(allMods.contains("audio,image"), allMods.toString)
    assert(allMods.contains("video"), allMods.toString)
  }

  private def planRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id", "keeper", "action", "n_members",
        "modalities").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5))).toSet

  test("q217 erasure: node removal splits a chain, evaporates a " +
    "singleton partner, keeps untouched clusters verbatim — and the " +
    "maintained plan equals the from-scratch survivor plan") {
    import spark.implicits._
    // chain {1,2,3,4}; untouched pair {10,11}; pair {20,21} that will
    // lose a member outright
    val edges = Seq(
      (1L, 2L, "image"), (2L, 3L, "audio"), (3L, 4L, "video"),
      (10L, 11L, "image"),
      (20L, 21L, "video")).toDF("id_a", "id_b", "modality")
      .localCheckpoint()
    val stored = MediaDedup.planFromEdges(edges).localCheckpoint()
    // deleting 2 SPLITS the chain (1 evaporates, {3,4} survives with a
    // handed-off keeper); deleting 20 evaporates partner 21's cluster
    val delIds = Seq(2L, 20L).toDF("doc_id")
    val out = MediaDedup.maintainPlanDelete(stored, edges, delIds)
      .localCheckpoint()
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getString(3), r.getLong(4), r.getString(5),
      r.getString(6))).toSet
    assert(got === Set(
      (3L, 3L, 3L, "keep", 2L, "video", "recomputed"),
      (4L, 3L, 3L, "drop", 2L, "video", "recomputed"),
      (10L, 10L, 10L, "keep", 2L, "image", "kept"),
      (11L, 10L, 10L, "drop", 2L, "image", "kept")), got)
    // the law, independently: from-scratch plan over survivor edges
    val survEdges = edges.filter(!col("id_a").isin(2L, 20L)
      && !col("id_b").isin(2L, 20L))
    assert(planRows(out.drop("leg"))
      === planRows(MediaDedup.planFromEdges(survEdges)))
  }

  test("q217 erasure: deleting the chain HEAD hands the keeper off " +
    "without a split; the kept leg is stored state, not a recompute " +
    "(poison proof)") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, "image"), (2L, 3L, "audio"), (3L, 4L, "video"),
      (10L, 11L, "image")).toDF("id_a", "id_b", "modality")
      .localCheckpoint()
    // poison the untouched cluster's stored rows: impossible n_members
    val stored = MediaDedup.planFromEdges(edges)
      .withColumn("n_members",
        when(col("cluster_id") === 10L, lit(999L))
          .otherwise(col("n_members")))
      .localCheckpoint()
    val out = MediaDedup.maintainPlanDelete(stored, edges,
      Seq(1L).toDF("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5), r.getString(6))).toSet
    assert(out === Set(
      // keeper handed from 1 to 2; the cluster label moves with it,
      // and the image evidence leaves with the deleted edge (1,2)
      (2L, 2L, 2L, "keep", 3L, "audio,video", "recomputed"),
      (3L, 2L, 2L, "drop", 3L, "audio,video", "recomputed"),
      (4L, 2L, 2L, "drop", 3L, "audio,video", "recomputed"),
      // poisoned rows flow through verbatim — the kept leg reads state
      (10L, 10L, 10L, "keep", 999L, "image", "kept"),
      (11L, 10L, 10L, "drop", 999L, "image", "kept")), out)
  }

  test("q217 driver surface at sf0.001: every deleted clip's rows are " +
    "gone, partners of evaporated pairs leave the plan, untouched " +
    "clusters carry kept — maintained equals the survivor scratch") {
    val (edges, stored) = MediaDedup.planShared(spark, dir)
    val q = MediaDedup.mediaDeleteQuery(spark, dir).localCheckpoint()
    val del = stored
      .filter(col("doc_id") % MediaDedup.DeleteMod
        === MediaDedup.DeleteMod - 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(del.nonEmpty, "no deleted clips at this SF — test is vacuous")
    val got = q.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.intersect(del).isEmpty, "a deleted clip survived")
    // all driver clusters are planted pairs: each deletion evaporates
    // its partner too, so the plan shrinks by the whole dirty cluster
    assert(got.size === stored.count().toInt - 2 * del.size)
    val survEdges = edges
      .join(q.select(col("doc_id").as("id_a")).distinct(), Seq("id_a"),
        "left_semi")
      .join(q.select(col("doc_id").as("id_b")).distinct(), Seq("id_b"),
        "left_semi")
    assert(planRows(q.drop("leg"))
      === planRows(MediaDedup.planFromEdges(survEdges)))
  }
}
