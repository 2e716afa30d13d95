package graft.text

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches the hand-computed formula on a tiny corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25Scores(docs, Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=8/3, df(a)=2, idf=ln(1.6)
    val idf = math.log(1.6)
    val s1 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / (8.0 / 3)))
    val s2 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / (8.0 / 3)))
    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(1L) - s1) < 1e-12 && math.abs(out(2L) - s2) < 1e-12)
  }

  test("bm25 length normalization: same tf, shorter doc scores higher") {
    val docs = Seq((1L, "a b"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = Retrieval.bm25Scores(docs, Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L))
  }

  test("bm25: rarer terms contribute more (df effect)") {
    val docs = Seq((1L, "rare x"), (2L, "common x"), (3L, "common y"),
      (4L, "common z")).toDF("doc_id", "text")
    val out = Retrieval.bm25Scores(docs, Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L)) // same tf=1, same dl — only df differs
  }

  test("hybrid RRF on testdata: 20 rows, descending, ranks in range") {
    val out = Retrieval.hybridQuery(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 20)
    val rrfs = out.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    val ranks = out.flatMap(r => Seq(Option(r.get(1)), Option(r.get(2))))
      .flatten.map(_.asInstanceOf[Long])
    assert(ranks.forall(r => r >= 1 && r <= 50))
    // fused docs that appear in both systems must outrank single-system
    // docs of equal rank: doc present in both lists exists in the top 20
    assert(out.exists(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }
}
