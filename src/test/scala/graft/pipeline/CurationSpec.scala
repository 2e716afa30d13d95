package graft.pipeline

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 24 distinct tokens — passes the 20-token gate
  val base = (1 to 24).map(i => s"w$i").mkString(" ")
  // shares the 23-token prefix with base (J ≈ 0.7) but is 30 tokens long
  val nearDup = base.split(" ").dropRight(1).mkString(" ") + " zz " +
    (1 to 6).map(i => s"y$i").mkString(" ")

  val docs = Seq(
    (1L, base, "en"),
    (2L, base, "en"),           // exact duplicate → dropped (keep-min)
    (3L, nearDup, "en"),        // near-dup of 1 → dropped (not cluster rep)
    (4L, "too short", "en"),    // fails the token gate
    (5L, (100 to 125).map(i => s"v$i").mkString(" "), "fr")) // kept
    .toDF("doc_id", "text", "lang")

  test("curation keeps gated, deduped cluster representatives with splits") {
    val out = Curation.curate(docs, minTokens = 20L).collect()
    val kept = out.map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
    val splits = out.map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(splits.values.forall(Set("train", "val", "test")))
    // langs survive the chain
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toMap
      == Map(1L -> "en", 5L -> "fr"))
  }

  test("curated sf0.001 corpus is actually clean: no dup/near-dup survivors") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Curation.curate(docs)
    val kept = docs.join(out.select("doc_id"), "doc_id")
    assert(out.count() > 300) // the gate+dedup keeps most of the 500 docs
    // no two survivors share identical text
    assert(kept.groupBy(col("text")).count().filter(col("count") > 1).count() == 0)
    // no surviving near-dup pair at the pipeline's own threshold/cap
    assert(graft.dedup.Dedup.jaccardPairs(kept, k = 5, threshold = 0.2,
      maxDf = 100).count() == 0)
    spark.catalog.clearCache()
  }

  test("near-dup drop decisions do not depend on the quality gate") {
    // raise the gate so doc 1 (24 tokens) is gated while doc 3 (30 tokens)
    // passes — doc 3 must STILL be dropped: clusters form over the full
    // corpus and its representative (doc 1) is not doc 3
    val out = Curation.curate(docs, minTokens = 26L).collect()
    assert(out.map(_.getLong(0)).toSet == Set(5L))
  }

  test("ragPrep: gate excludes, dedup collapses, chunk math is exact") {
    val tokens70 = (1 to 70).map(i => s"t$i").mkString(" ")
    val d = Seq(
      (1L, tokens70),           // 70 tokens → chunks at 64/48: 2 (64 + 22)
      (2L, tokens70),           // exact dup of 1 → deduped away
      (3L, "too short"),        // gated (< 20 tokens)
      (4L, (1 to 48).map(i => s"u$i").mkString(" ")) // 48 tokens → 1 chunk
    ).toDF("doc_id", "text")
    val r = Curation.ragPrep(d).collect()(0)
    assert(r.getLong(0) == 2L)              // docs 1 and 4 kept
    assert(r.getLong(1) == 3L)              // 2 + 1 chunks
    assert(r.getLong(2) == (64L + 22L) + 48L)
  }
}
