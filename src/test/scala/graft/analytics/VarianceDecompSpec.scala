package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ANOVA decomposition contracts: a hand-computed 2-group table, the
  * additivity identity against a brute-force recompute, and the two
  * degenerate directions (grouping explains nothing / everything).
  */
class VarianceDecompSpec extends SparkSpec {

  private def df(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "cents")
  }

  test("hand-computed 2-group decomposition matches brute force") {
    val rows = Seq(("a", 100L), ("a", 300L), ("b", 500L), ("b", 900L))
    val r = VarianceDecomp.anova(df(rows: _*), col("g"), col("cents")).head
    val xs = rows.map(_._2.toDouble / 100.0)
    val mu = xs.sum / xs.length
    val sst = xs.map(x => (x - mu) * (x - mu)).sum
    val groups = rows.groupBy(_._1).values
    val ssw = groups.map { g =>
      val ys = g.map(_._2.toDouble / 100.0); val m = ys.sum / ys.length
      ys.map(y => (y - m) * (y - m)).sum
    }.sum
    assert(math.abs(r.getDouble(2) - sst) < 1e-6)
    assert(math.abs(r.getDouble(4) - ssw) < 1e-6)
    assert(math.abs(r.getDouble(3) - (sst - ssw)) < 1e-6)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("a grouping identical to the value explains everything; a " +
    "constant-mean grouping explains nothing") {
    val all = VarianceDecomp.anova(
      df(("a", 100L), ("a", 100L), ("b", 700L), ("b", 700L)),
      col("g"), col("cents")).head
    assert(math.abs(all.getDouble(5) - 1.0) < 1e-9)
    val none = VarianceDecomp.anova(
      df(("a", 100L), ("a", 700L), ("b", 100L), ("b", 700L)),
      col("g"), col("cents")).head
    assert(math.abs(none.getDouble(5)) < 1e-9)
  }

  test("q192: eta² in [0,1], parts sum to the total at output grain") {
    val r = VarianceDecomp.anovaQuery(spark, "/root/testdata/sf0.001").head
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    assert(math.abs(r.getDouble(2) - r.getDouble(3) - r.getDouble(4)) < 0.02)
  }
}
