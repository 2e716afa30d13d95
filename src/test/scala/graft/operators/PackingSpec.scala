package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // doc_ids chosen non-contiguous: canonical order is doc_id, not arrival
  private val docs = Seq(
    (10L, "a b c d e"),          // 5 tokens, offsets [0,5)
    (20L, "f g h"),              // 3 tokens, [5,8)  — crosses the 6-cut
    (30L, "i j"),                // 2 tokens, [8,10) — bin 1
    (40L, "k l m n o p q")       // 7 tokens, [10,17) — bin 1, crosses
  ).toDF("doc_id", "text")

  test("packingPlan: offsets, bins, and boundary crossers (budget 6)") {
    val out = Packing.packingPlan(docs, budgetTokens = 6L, bucketWidth = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bin 0: docs 10 (5 tok) + 20 (3 tok, start 5, crosses); bin 1: 30 + 40
    assert(out.toSeq == Seq(
      (0L, 2L, 8L, 1L),
      (1L, 2L, 9L, 1L)))
  }

  test("packingPlan: bucket width cannot change the plan") {
    val a = Packing.packingPlan(docs, 6L, bucketWidth = 1L).collect().toSeq
    val b = Packing.packingPlan(docs, 6L, bucketWidth = 1000L).collect().toSeq
    assert(a == b)
  }

  test("packingPlan: empty documents are excluded from the stream") {
    val withEmpty = docs.union(Seq((15L, "")).toDF("doc_id", "text"))
    assert(Packing.packingPlan(withEmpty, 6L, 16L).collect().toSeq
      == Packing.packingPlan(docs, 6L, 16L).collect().toSeq)
  }

  test("chunks: overlap, stride, and short tail are exact") {
    val d = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val out = Packing.chunks(d, k = 4, s = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, "t1 t2 t3 t4", 4L),   // [1..4]
      (1L, "t4 t5 t6 t7", 4L),   // [4..7] — 1-token overlap
      (2L, "t7", 1L)))           // short tail, still emitted
  }

  test("chunks: every token is covered at least once") {
    val d = Seq((1L, (1 to 23).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val covered = Packing.chunks(d, k = 8, s = 5)
      .collect().flatMap(_.getString(2).split(" ")).toSet
    assert(covered == (1 to 23).map("w" + _).toSet)
  }

  test("chunks: stride == chunk gives disjoint exact partition") {
    val d = Seq((1L, (1 to 12).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val out = Packing.chunks(d, k = 4, s = 4).collect()
    assert(out.length == 3 && out.forall(_.getLong(3) == 4L))
  }
}
