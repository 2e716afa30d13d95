package graft.analytics

import graft.SparkSpec

/** CUPED contracts on the testdata corpus: the adjustment is
  * mean-preserving over the pooled population, ρ² is a valid squared
  * correlation, and θ = 0 degenerates to the raw means.
  */
class CupedSpec extends SparkSpec {

  private lazy val rows =
    Cuped.cupedQuery(spark, "/root/testdata/sf0.001").collect()

  test("two arms, every user counted exactly once") {
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    val n = rows.map(_.getLong(1)).sum
    import org.apache.spark.sql.functions._
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(n === users)
  }

  test("the adjustment is mean-preserving: the user-weighted average of " +
    "adjusted means equals that of raw means (up to rounding)") {
    val n = rows.map(_.getLong(1).toDouble)
    val raw = rows.map(_.getDouble(2))
    val adj = rows.map(_.getDouble(3))
    val wRaw = (raw, n).zipped.map(_ * _).sum / n.sum
    val wAdj = (adj, n).zipped.map(_ * _).sum / n.sum
    assert(math.abs(wRaw - wAdj) < 1e-3)
  }

  test("rho2 is a squared correlation in [0, 1] and both arms report " +
    "the same pooled theta") {
    val r2 = rows.map(_.getDouble(5)).distinct
    assert(r2.length === 1 && r2(0) >= 0.0 && r2(0) <= 1.0)
    assert(rows.map(_.getDouble(4)).distinct.length === 1)
  }
}
