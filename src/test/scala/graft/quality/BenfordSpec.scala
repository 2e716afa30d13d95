package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Benford audit contracts: expected constants sum to 1, a perfectly
  * Benford-weighted fixture scores ~0 chi-square, and a uniform
  * (fabricated-looking) fixture scores much worse.
  */
class BenfordSpec extends SparkSpec {

  private def amounts(vs: Long*) = {
    import spark.implicits._
    vs.toDF("v")
  }

  test("the nine compiled expected probabilities sum to 1") {
    assert(math.abs(Benford.Expected.sum - 1.0) < 1e-12)
    assert(Benford.Expected.zip(Benford.Expected.tail)
      .forall { case (a, b) => a > b }) // strictly decreasing
  }

  test("zero and negative amounts are excluded; digits come from the " +
    "decimal string") {
    val out = Benford.audit(amounts(0L, -500L, 123L, 999L, 10000L),
      col("v")).collect()
    assert(out.map(_.getLong(1)).sum === 3L) // only 123, 999, 10000
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(1) === 2L && byDigit(9) === 1L)
  }

  test("a Benford-proportioned fixture scores near zero; a uniform one " +
    "scores far worse") {
    // 1000 rows proportioned to the expected distribution (rounded)
    val benfordish = Benford.Expected.zipWithIndex.flatMap { case (p, i) =>
      Seq.fill(math.round(p * 1000).toInt)((i + 1) * 100L) }
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(d * 100L))
    val cGood = Benford.audit(amounts(benfordish: _*), col("v"))
      .head.getDouble(5)
    val cBad = Benford.audit(amounts(uniform: _*), col("v"))
      .head.getDouble(5)
    assert(cGood < 1.0, s"benford-proportioned chi2 $cGood")
    assert(cBad > 10.0 * math.max(cGood, 0.1), s"uniform chi2 $cBad")
  }

  test("q195: complete digit grid, shares sum to 1") {
    val rows = Benford.benfordQuery(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 9))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(rows.map(_.getDouble(5)).distinct.length === 1) // one chi2
  }
}
