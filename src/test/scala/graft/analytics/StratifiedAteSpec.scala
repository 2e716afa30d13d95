package graft.analytics

import graft.SparkSpec

/** Stratified-ATE contracts: a planted confounder is removed by
  * stratification (the adjusted estimate recovers the true effect, the
  * naive one doesn't), unsupported strata are counted not silently
  * dropped, and balance is reported.
  */
class StratifiedAteSpec extends SparkSpec {

  private def units(rows: (Long, Long, Boolean, Long)*) = {
    import spark.implicits._
    rows.toDF("unit_id", "score", "treated", "cents")
  }

  test("a planted confounder: naive ATE is biased, stratified is not") {
    // outcome = 100*score + 500*treated (true effect $5). Treatment
    // concentrates in high scores: naive mixes the score gradient in.
    var id = 0L
    val rows = (0 until 10).flatMap { s =>
      val nT = if (s < 5) 2 else 8; val nC = 10 - nT
      Seq.fill(nT) { id += 1
        (id, s.toLong, true, 100L * s + 500L) } ++
      Seq.fill(nC) { id += 1
        (id, s.toLong, false, 100L * s) }
    }
    val r = StratifiedAte.estimate(units(rows: _*)).head
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-6,
      s"adjusted ${r.getDouble(4)}")
    assert(r.getDouble(3) > 5.5, s"naive ${r.getDouble(3)} should be biased")
    assert(math.abs(r.getDouble(5) - (r.getDouble(3) - r.getDouble(4)))
      < 2e-4)
  }

  test("an all-treated stratum is excluded AND counted") {
    val rows =
      (1L to 6L).map(i => (i, 9L, true, 1000L)) ++   // top stratum: T only
      (7L to 12L).map(i => (i, 1L, i % 2 == 0, 100L))
    val r = StratifiedAte.estimate(units(rows: _*)).head
    assert(r.getLong(2) === 6L) // the unsupported rows are visible
  }

  test("q199 runs: one row, arms populated, balance in (0,1)") {
    val r = StratifiedAte.ateQuery(spark, "/root/testdata/sf0.001").head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val b = r.getDouble(6)
    assert(b > 0.0 && b < 1.0)
  }
}
