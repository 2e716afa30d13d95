package graft.quality

import graft.SparkSpec

class DriftReportSpec extends SparkSpec {
  import spark.implicits._

  test("numeric drift reports exact mean/stddev deltas") {
    val oldS = Seq(1.0, 2.0, 3.0).toDF("x")        // mean 2, sd_pop 0.816497
    val newS = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")   // mean 4.5, sd_pop 1.118034
    val m = DriftReport.numericDrift(oldS, newS, "x").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(m("count(x)") === ((3.0, 4.0, 1.0)))
    assert(m("mean(x)") === ((2.0, 4.5, 2.5)))
    assert(m("stddev(x)") === ((0.816497, 1.118034, 0.301537)))
  }

  test("TVD is 0 for identical and 1 for disjoint distributions") {
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("x", "x", "x", "y", "y", "y").toDF("v")
    // p_a = (2/3, 1/3), p_b = (1/2, 1/2) -> TVD = (1/6 + 1/6)/2 = 1/6
    val partial = DriftReport.categoricalDrift(a, b, "v")
      .collect().head.getDouble(3)
    assert(partial === 0.166667)
    val same = DriftReport.categoricalDrift(a, a, "v")
      .collect().head.getDouble(3)
    assert(same === 0.0)
    val disjoint = DriftReport
      .categoricalDrift(Seq("x").toDF("v"), Seq("z").toDF("v"), "v")
      .collect().head.getDouble(3)
    assert(disjoint === 1.0)
  }

  test("categories missing from one snapshot contribute their full mass") {
    val oldS = Seq("a", "a", "b", "b").toDF("v")
    val newS = Seq("a", "a", "a", "a").toDF("v")
    // |0.5-1| + |0.5-0| = 1 -> TVD 0.5
    val r = DriftReport.categoricalDrift(oldS, newS, "v").collect().head
    assert(r.getDouble(3) === 0.5)
  }

  test("PSI: identical distributions score ~0; a full shift crosses the " +
    "0.25 action threshold; moments can't see what PSI sees") {
    def vals(xs: Seq[Double]) = xs.toDF("x")
    def psi(a: Seq[Double], b: Seq[Double]): Double =
      DriftReport.psiDrift(vals(a), vals(b), "x", 0.0, 200.0, 20)
        .agg(org.apache.spark.sql.functions.sum("psi_contrib"))
        .collect().head.getDouble(0)
    val base = (0 until 400).map(i => (i % 100).toDouble)       // uniform [0,100)
    assert(math.abs(psi(base, base)) < 1e-9, "self-PSI must be 0")
    val shifted = base.map(_ + 100.0)                           // uniform [100,200)
    assert(psi(base, shifted) > 0.25, "a disjoint shift must trip the gate")
    // the PSI-only catch: mirror the distribution around the midpoint —
    // mean and stddev are IDENTICAL, but mass moved between bins
    val bimodalA = (0 until 400).map(i => if (i % 2 == 0) 40.0 else 160.0)
    val bimodalB = (0 until 400).map(_ => 100.0)
    assert(psi(bimodalA, bimodalB) > 0.25,
      "mode collapse preserves the mean but must trip PSI")
  }

  test("PSI grid: every bin surfaces (empty ones smoothed, finite), " +
    "out-of-range values clamp to the edge bins") {
    val base = Seq(50.0, 50.0, 50.0).toDF("x")
    val cur = Seq(-10.0, 500.0).toDF("x") // below lo, above hi
    val rows = DriftReport.psiDrift(base, cur, "x", 0.0, 200.0, 20)
      .collect()
    assert(rows.length == 20, "one row per bin, empty included")
    assert(rows.forall(r => !r.getDouble(4).isNaN && !r.getDouble(4).isInfinite),
      "smoothing must keep every contribution finite")
    val byBin = rows.map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byBin(0)._2 == 1L && byBin(19)._2 == 1L,
      "out-of-range values must clamp into the edge bins")
    assert(byBin(5)._1 == 3L, "in-range values land in their bin")
  }
}
