package graft.analytics

import java.sql.Date

import graft.SparkSpec

/** CUSUM contracts: a planted level shift is located exactly, the
  * reported means bracket it, a no-shift series reports a small peak,
  * and the (|nS| DESC, day DESC) tie convention holds.
  */
class CusumSpec extends SparkSpec {

  private def series(rows: (String, Long)*) = {
    import spark.implicits._
    rows.map { case (d, c) => (Date.valueOf(d), c) }.toDF("day", "cents")
  }

  test("a planted step is located at its last pre-shift day") {
    // 5 days at $1, then 5 days at $9 -> the cut belongs after Jan 5
    val rows = (1 to 10).map(i =>
      (f"2024-01-$i%02d", if (i <= 5) 100L else 900L))
    val r = Cusum.changePoint(series(rows: _*)).head
    assert(r.getDate(0).toString === "2024-01-05")
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 9.0)
    assert(r.getDouble(4) === 8.0)
  }

  test("multiple observations per day aggregate before the scan") {
    val rows = Seq(("2024-01-01", 100L), ("2024-01-01", 100L),
      ("2024-01-02", 100L), ("2024-01-03", 500L), ("2024-01-03", 500L))
    val r = Cusum.changePoint(series(rows: _*)).head
    assert(r.getDate(0).toString === "2024-01-02")
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 5.0)
  }

  test("a constant series peaks at zero magnitude (no fake shift size)") {
    val rows = (1 to 8).map(i => (f"2024-01-0$i", 300L))
    val r = Cusum.changePoint(series(rows: _*)).head
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(4) === 0.0)
  }

  test("q198 runs on testdata: the reported shift equals the mean gap") {
    val r = Cusum.cusumQuery(spark, "/root/testdata/sf0.001").head
    assert(math.abs(r.getDouble(4)
      - (r.getDouble(3) - r.getDouble(2))) < 2e-4) // two 4-dp roundings
  }
}
