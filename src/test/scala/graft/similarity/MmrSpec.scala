package graft.similarity

import graft.SparkSpec

/** MMR contracts on hand candidate sets: diversity actually overrides
  * relevance, ties break on id, exhaustion fails loudly.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def simsDf(rows: (Long, Long, Double)*) =
    (rows ++ rows.map { case (a, b, s) => (b, a, s) })
      .toDF("a", "b", "sim")

  test("a near-duplicate of the first pick loses to a less relevant " +
    "but diverse candidate") {
    val cands = Seq((1L, 0.9), (2L, 0.85), (3L, 0.8)).toDF("id", "rel")
    // 2 is a near-dup of 1; 3 is unrelated to both
    val sims = simsDf((1L, 2L, 0.95), (1L, 3L, 0.1), (2L, 3L, 0.1))
    val out = Mmr.select(cands, sims, k = 3, lambda = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L)
    assert(out(2L) === 3L) // 0.7*0.8-0.3*0.1 = 0.53 beats 0.7*0.85-0.3*0.95 = 0.31
    assert(out(3L) === 2L)
  }

  test("exact score ties pick the smaller id") {
    val cands = Seq((7L, 0.5), (4L, 0.5), (9L, 0.5)).toDF("id", "rel")
    val sims = simsDf((4L, 7L, 0.2), (4L, 9L, 0.2), (7L, 9L, 0.2))
    val out = Mmr.select(cands, sims, k = 3, lambda = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 4L && out(2L) === 7L && out(3L) === 9L)
  }

  test("k beyond the candidate set fails loudly, not silently short") {
    val cands = Seq((1L, 0.9)).toDF("id", "rel")
    val sims = simsDf()
    intercept[IllegalArgumentException] {
      Mmr.select(cands, sims, k = 2, lambda = 0.7).collect()
    }
  }

  test("q179 on testdata: 6 distinct picks, rank 1 is the relevance " +
    "argmax, and greedy pick scores are non-increasing") {
    val rows = Mmr.mmrQuery(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 6)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length === 6)
    val rels = rows.map(_.getDouble(2))
    assert(rels(0) === rels.max) // first pick = pure relevance argmax
    // the penalty is monotone in the selected set, so the greedy
    // maximum can only fall step over step
    val scores = rows.map(_.getDouble(3))
    assert(scores.sliding(2).forall { case Array(a, b) => b <= a + 1e-9 })
  }
}
