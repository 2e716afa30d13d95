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
}
