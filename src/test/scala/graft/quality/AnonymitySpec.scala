package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** k-anonymity audit contracts: a hand-traced registry, ladder
  * monotonicity, and the l-diversity counter's independence from
  * class size.
  */
class AnonymitySpec extends SparkSpec {

  private def rowsDf(rows: (String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("qa", "qb", "sens")
  }

  test("hand-traced: class sizes, k ladder, and l-diversity flags") {
    // classes: (a,x) size 3 w/ 2 sensitive values; (a,y) size 1;
    // (b,x) size 2 with ONE sensitive value (fails l=2 despite size)
    val df = rowsDf(
      ("a", "x", 1L), ("a", "x", 1L), ("a", "x", 2L),
      ("a", "y", 5L),
      ("b", "x", 7L), ("b", "x", 7L))
    val out = Anonymity.audit(df, Seq(col("qa"), col("qb")), col("sens"),
      ladder = Seq(2, 3)).collect()
    val k2 = out(0); val k3 = out(1)
    assert(k2.getInt(0) === 2 && k2.getLong(1) === 3L && k2.getLong(2) === 6L)
    assert(k2.getLong(3) === 1L && k2.getLong(4) === 1L) // only (a,y)
    assert(k2.getLong(5) === 2L) // (a,y) singleton + (b,x) one-value
    assert(k3.getLong(3) === 2L && k3.getLong(4) === 3L) // (a,y) + (b,x)
    assert(math.abs(k2.getDouble(6) - 1.0 / 6.0) < 1e-6) // 6-dp output
  }

  test("the ladder is monotone: raising k never lowers the risk share") {
    val rows = Anonymity.anonymityQuery(spark, "/root/testdata/sf0.001")
      .collect()
    val risk = rows.map(_.getDouble(6))
    assert(risk.zip(risk.tail).forall { case (a, b) => a <= b + 1e-12 })
    // class/row totals are k-independent
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    assert(rows.map(_.getLong(2)).distinct.length === 1)
  }
}
