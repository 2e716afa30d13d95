package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rank-sum contracts: a hand-ranked fixture with ties (midranks), the
  * U_a + U_b = n_a·n_b identity, symmetry under arm swap, and a
  * brute-force recompute on a seeded sample.
  */
class RankSumSpec extends SparkSpec {

  private def df(rows: (Boolean, Long)*) = {
    import spark.implicits._
    rows.toDF("t", "v")
  }

  private def run(rows: (Boolean, Long)*) =
    RankSum.test(df(rows: _*), col("t"), col("v")).head

  test("hand-ranked with ties: midranks drive U") {
    // values: A: 10, 20, 20 ; B: 20, 30. ranks: 10->1, the 20s share
    // (2+3+4)/3 = 3, 30->5. R_a = 1+3+3 = 7, U_a = 7 - 3*4/2 = 1.
    val r = run((true, 10L), (true, 20L), (true, 20L),
      (false, 20L), (false, 30L))
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 5.0) // U_b = n_a*n_b - U_a = 6 - 1
  }

  test("a tied pair yields the half-integer U midranks demand") {
    val r = run((true, 20L), (false, 20L))
    assert(r.getDouble(2) === 0.5 && r.getDouble(3) === 0.5)
  }

  test("U_a + U_b = n_a * n_b and arm swap mirrors the statistic") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map(i =>
      (i % 2 == 0, (100 + rnd.nextInt(500)).toLong))
    val r = run(rows: _*)
    assert(r.getDouble(2) + r.getDouble(3) ===
      r.getLong(0).toDouble * r.getLong(1))
    val sw = run(rows.map { case (t, v) => (!t, v) }: _*)
    assert(sw.getDouble(2) === r.getDouble(3))
    assert(math.abs(sw.getDouble(5) + r.getDouble(5)) < 1e-3)
  }

  test("matches a brute-force midrank recompute on a seeded tie-heavy " +
    "sample") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 200).map(i =>
      (rnd.nextBoolean(), (10 + rnd.nextInt(30)).toLong)) // heavy ties
    val r = run(rows: _*)
    val sorted = rows.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
    val nA = rows.count(_._1)
    val rA = rows.filter(_._1).map(t => rankOf(t._2)).sum
    val uA = rA - nA.toDouble * (nA + 1) / 2
    assert(r.getDouble(2) === uA)
  }

  test("q196 runs: identity holds on testdata") {
    val r = RankSum.rankSumQuery(spark, "/root/testdata/sf0.001").head
    assert(r.getDouble(2) + r.getDouble(3) ===
      r.getLong(0).toDouble * r.getLong(1))
    assert(math.abs(r.getDouble(4)) <= 1.0)
  }
}
