package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Release-funnel contracts: the funnel is monotone, and every stage
  * count agrees with the stand-alone operator it composes — the
  * quality gate with q112's rollup, the dedup stage with a direct
  * keeper recount, the release stage with the q53 screen.
  */
class ReleaseFunnelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    ReleaseFunnel.funnelQuery(spark, dir).collect()

  test("four stages, monotone in both documents and tokens") {
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val docs = rows.map(_.getLong(2)); val toks = rows.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a })
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
    assert(rows.head.getDouble(4) === 1.0)
  }

  test("the quality stage equals q112's own rollup summed over the " +
    "corpus sources") {
    val q112pass = graft.text.QualityRules.qualitySummary(
        graft.Tables.documents(spark, dir).filter(col("source") =!= "src0"))
      .agg(sum(col("n_pass"))).head.getLong(0)
    assert(rows(1).getLong(2) === q112pass)
  }

  test("the release stage equals keepers minus the q53-flagged set") {
    val docs = graft.Tables.documents(spark, dir)
    val flagged = graft.dedup.Dedup.containmentQuery(spark, dir)
      .select(col("doc_id")).distinct()
    // keepers that are flagged: recompute the keeper set directly
    val corpus = docs.filter(col("source") =!= "src0")
    val pass = graft.text.QualityRules.qualityFlags(corpus)
      .filter(col("pass")).select(col("doc_id"))
    val keepers = corpus.join(pass, Seq("doc_id"))
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val flaggedKeepers = keepers.join(flagged, Seq("doc_id")).count()
    assert(rows(3).getLong(2) === rows(2).getLong(2) - flaggedKeepers)
  }
}
