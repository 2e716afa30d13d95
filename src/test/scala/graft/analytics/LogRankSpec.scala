package graft.analytics

import graft.SparkSpec

/** Log-rank contracts: identical arms score ~0, a planted hazard gap
  * scores large, censoring is respected (censored rows shape risk sets
  * but never count as events), and a brute-force recompute agrees.
  */
class LogRankSpec extends SparkSpec {

  private def lt(rows: (Long, Boolean, Boolean)*) = {
    import spark.implicits._
    rows.toDF("duration_days", "churned", "arm")
  }

  private def brute(rows: Seq[(Long, Boolean, Boolean)]) = {
    val eventTimes = rows.filter(_._2).map(_._1).distinct.sorted
    var (oa, ea, v) = (0.0, 0.0, 0.0)
    for (t <- eventTimes) {
      val at = rows.filter(_._1 >= t)
      val d = rows.count(r => r._1 == t && r._2).toDouble
      val da = rows.count(r => r._1 == t && r._2 && r._3).toDouble
      val n = at.size.toDouble; val na = at.count(_._3).toDouble
      oa += da; ea += d * (na / n)
      if (n > 1) v += d * (na / n) * (1 - na / n) * (n - d) / (n - 1)
    }
    (oa, ea, v)
  }

  test("symmetric arms: chi-square is (near) zero") {
    val rows = (1L to 20L).flatMap(d =>
      Seq((d, d % 3 != 0, true), (d, d % 3 != 0, false)))
    val r = LogRank.test(lt(rows: _*)).head
    assert(r.getDouble(5) < 1e-9)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9) // O/E = 1
  }

  test("a planted hazard gap: the fast-churn arm shows O > E and a " +
    "large chi-square") {
    // arm A churns early (days 1-5), arm B late (days 15-20), 3 per day
    val rows = (1L to 5L).flatMap(d => Seq.fill(3)((d, true, true))) ++
      (15L to 20L).flatMap(d => Seq.fill(3)((d, true, false))) ++
      Seq((25L, false, true), (25L, false, false))
    val r = LogRank.test(lt(rows: _*)).head
    assert(r.getDouble(4) > 1.0, s"O/E ${r.getDouble(4)}")
    assert(r.getDouble(5) > 3.84, s"chi2 ${r.getDouble(5)}") // p<.05 line
  }

  test("matches the brute-force recompute on a seeded censored sample") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 120).map { i =>
      ((1 + rnd.nextInt(15)).toLong, rnd.nextInt(4) > 0,
        i % 2 == 0) }
    val r = LogRank.test(lt(rows: _*)).head
    val (oa, ea, v) = brute(rows)
    assert(r.getLong(2).toDouble === oa)
    assert(math.abs(r.getDouble(3) - ea) < 1e-3)
    assert(math.abs(r.getDouble(5) - (oa - ea) * (oa - ea) / v) < 1e-3)
  }

  test("q197 runs: one row, O/E positive, chi-square non-negative") {
    val r = LogRank.logRankQuery(spark, "/root/testdata/sf0.001").head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    if (!r.isNullAt(5)) assert(r.getDouble(5) >= 0.0)
  }
}
