package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Media-dedup-plan contracts: the plan's clusters are exactly the
  * planted (4k, 4k+1) near-dup pairs (no cross-group chaining — fresh
  * media land ~32 bits away), the union of the two modality legs
  * recovers more of them than either alone, the keeper convention
  * (smallest id; equals the star-forest root label) holds on every
  * row, and actions partition each cluster into one keep + drops.
  */
class MediaDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q209: clusters are exactly planted pairs, keeper law holds, " +
    "union recall beats the floor") {
    val rows = MediaDedup
      .mediaDedupPlanQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, cluster, keeper, action, n, mods) =>
      assert(keeper === cluster, s"keeper $keeper != cluster label $cluster")
      assert(n === 2L, s"cluster $cluster has $n members (chained?)")
      assert(keeper % 4 === 0L, s"keeper $keeper not a planted base")
      assert(doc === keeper || doc === keeper + 1, s"un-planted member $doc")
      assert(if (doc == keeper) action == "keep" else action == "drop")
      assert(Set("image", "audio", "audio,image")(mods), mods)
    }
    // each cluster contributes exactly one keep and one drop
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.map(_._4).sorted.toSeq === Seq("drop", "keep"), s"cluster $c")
    }
    // union recall: at least as many planted groups as the stronger leg
    val nGroups = graft.Tables.documents(spark, dir)
      .select(max(col("doc_id"))).collect()(0).getLong(0) / 4 + 1
    val recall = byCluster.size.toDouble / nGroups
    assert(recall >= 0.95, s"union recall $recall (${byCluster.size}/$nGroups)")
    // both modalities contribute evidence somewhere
    val allMods = rows.map(_._6).toSet
    assert(allMods.contains("audio,image"), allMods.toString)
  }
}
