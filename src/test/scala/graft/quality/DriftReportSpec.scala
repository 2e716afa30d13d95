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
}
