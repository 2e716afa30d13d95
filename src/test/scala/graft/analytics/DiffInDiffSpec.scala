package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DiD contracts: a hand-traced 2×2 with a planted effect, invariance
  * to group-level shifts and common shocks (the estimator's defining
  * property), and the pre-trend check catching a sloped control.
  */
class DiffInDiffSpec extends SparkSpec {

  private def panel(rows: (Boolean, String, Long)*) = {
    import spark.implicits._
    rows.toDF("treated", "period", "cents")
  }

  private def base = Seq(
    (true, "pre1", 1000L), (true, "pre2", 1100L), (true, "post", 1600L),
    (false, "pre1", 500L), (false, "pre2", 600L), (false, "post", 700L))

  test("hand-traced: planted effect of $4, zero pre-trend gap") {
    val r = DiffInDiff.estimate(panel(base: _*)).head
    // treated change 5.00, control change 1.00 -> did 4.00
    assert(r.getDouble(1) === 5.0 && r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 4.0)
    // both groups gained exactly $1 pre1 -> pre2
    assert(r.getDouble(4) === 0.0)
  }

  test("invariant to a constant treated-group level shift and to a " +
    "common post-period shock") {
    val shifted = base.map { case (t, p, c) => (t, p, if (t) c + 7777 else c) }
    val shocked = base.map { case (t, p, c) =>
      (t, p, if (p == "post") c + 555 else c) }
    val d0 = DiffInDiff.estimate(panel(base: _*)).head.getDouble(3)
    assert(DiffInDiff.estimate(panel(shifted: _*)).head.getDouble(3) === d0)
    assert(DiffInDiff.estimate(panel(shocked: _*)).head.getDouble(3) === d0)
  }

  test("a sloped control group surfaces in pretrend_gap, not silently") {
    val sloped = base.map { case (t, p, c) =>
      (t, p, if (!t && p == "pre2") c + 300 else c) }
    val r = DiffInDiff.estimate(panel(sloped: _*)).head
    assert(math.abs(r.getDouble(4) + 3.0) < 1e-9) // control gained $3 extra
  }

  test("q191 runs and returns one row with all cells populated") {
    val r = DiffInDiff.didQuery(spark, "/root/testdata/sf0.001").collect()
    assert(r.length === 1)
    (1 to 4).foreach(i => assert(!r.head.isNullAt(i)))
  }
}
