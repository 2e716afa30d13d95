package graft.analytics

import graft.SparkSpec

/** Conformal contracts: the coverage guarantee holds empirically on the
  * exchangeable mod-3 splits, q̂ is the exact order statistic (diffed
  * against a driver-side sort of the calibration residuals), and the
  * split sizes partition the table.
  */
class ConformalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.001"
  private lazy val row = Conformal.conformalQuery(spark, dir).collect()(0)

  test("the three splits partition the orders table") {
    val total = graft.Tables.orders(spark, dir).count()
    assert(row.getLong(0) + row.getLong(1) + row.getLong(2) === total)
  }

  test("empirical test coverage is near the 90% target (exchangeable " +
    "splits: the distribution-free guarantee at work)") {
    val cov = row.getDouble(6)
    assert(cov >= 0.85 && cov <= 0.97, s"coverage $cov")
  }

  test("q_hat equals the ceil((n+1)*0.9)-th smallest calibration " +
    "residual computed by brute-force sort") {
    // independent recomputation: fit coefficients from the query row,
    // residuals + sort on the driver
    val b = row.getDouble(3) // rounded — recompute exactly instead
    val o = graft.Tables.orders(spark, dir).select(
        (col("o_orderkey") % 3).as("split"),
        datediff(to_date(col("o_orderdate")),
          lit("1992-01-01").cast("date")).cast("long").as("x"),
        round(col("o_totalprice") * 100).cast("long").as("y"))
      .collect()
    val tr = o.filter(_.getLong(0) == 0L)
    val n = tr.length.toLong
    val sx = tr.map(r => BigInt(r.getLong(1))).sum
    val sy = tr.map(r => BigInt(r.getLong(2))).sum
    val sxx = tr.map(r => BigInt(r.getLong(1)) * r.getLong(1)).sum
    val sxy = tr.map(r => BigInt(r.getLong(1)) * r.getLong(2)).sum
    val bb = (BigInt(n) * sxy - sx * sy).toDouble /
      (BigInt(n) * sxx - sx * sx).toDouble
    val aa = (sy.toDouble - bb * sx.toDouble) / n
    val cal = o.filter(_.getLong(0) == 1L)
      .map(r => math.abs(r.getLong(2).toDouble
        - (aa + bb * r.getLong(1).toDouble))).sorted
    val k = math.ceil((cal.length + 1L) * 0.9).toInt
    val expected = BigDecimal(cal(k - 1) / 100.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(5) - expected) < 1e-9,
      s"engine ${row.getDouble(5)} vs sorted $expected")
    assert(math.abs(b - bb) < 1e-4) // the rounded slope agrees too
  }
}
