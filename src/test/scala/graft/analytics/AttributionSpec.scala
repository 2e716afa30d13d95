package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

/** Time-decay MTA contracts: hand-computed shares, credit conservation,
  * and the exact-horizon exclusion.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val H = 3600L * 1000000L

  test("shares split by recency and accumulate per view, by hand") {
    val views = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 10:20:00")))
      .toDF("imp_id", "user_id", "imp_ts")
    val clicks = Seq(
      (21L, 1L, ts("2024-01-01 10:30:00")), // ages 30/10 min
      (22L, 1L, ts("2024-01-01 10:40:00"))) // ages 40/20 min
      .toDF("click_id", "user_id", "click_ts")
    val out = Attribution.timeDecayCredit(views, clicks, H, topN = 10)
      .collect().map(r => r.getAs[Long]("imp_id") ->
        (r.getAs[Long]("n_clicks"), r.getAs[Double]("credit"))).toMap
    // click 21: raws 1800e6/3000e6 -> shares 0.375 / 0.625
    // click 22: raws 1200e6/2400e6 -> shares 0.333333 / 0.666667
    assert(out(10L) === ((2L, 0.708333)))
    assert(out(11L) === ((2L, 1.291667)))
    // conservation: total credit = one unit per click (mod 6-dp rounding)
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 2.0) < 1e-5)
  }

  test("a view at exactly the horizon earns nothing and poisons nothing") {
    val views = Seq((10L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("imp_id", "user_id", "imp_ts")
    val clicks = Seq((21L, 1L, ts("2024-01-01 11:00:00"))) // age == horizon
      .toDF("click_id", "user_id", "click_ts")
    val out = Attribution.timeDecayCredit(views, clicks, H, topN = 10)
      .collect()
    assert(out.isEmpty, "raw = 0 pairs must be excluded, not divided by")
  }
}
