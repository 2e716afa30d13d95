package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

/** Contribution-cap contracts: a hyperactive user is clamped to
  * exactly C rows, the reservoir is (ts, event_id)-deterministic
  * under duplicate timestamps, and an under-cap corpus releases
  * unchanged.
  */
class CappedContributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("a hyperactive user is clamped at the cap; quiet users pass " +
    "through; loss is reported") {
    // user 1: 7 clicks of value 1.0; user 2: 2 clicks of value 10.0
    val rows =
      (0 until 7).map(i => (i.toLong, ts(s"2024-01-01 00:0$i:00"), 1L,
        "click", 1.0, "{}")) ++
      Seq((7L, ts("2024-01-01 01:00:00"), 2L, "click", 10.0, "{}"),
        (8L, ts("2024-01-01 01:01:00"), 2L, "click", 10.0, "{}"))
    val out = CappedContribution.cappedRelease(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      cap = 3).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_users") === 2L)
    assert(r.getAs[Long]("n_rows") === 9L)
    assert(r.getAs[Long]("n_rows_capped") === 5L) // 3 of user 1 + 2 of user 2
    assert(r.getAs[Double]("sum_value") === 27.0)
    assert(r.getAs[Double]("sum_value_capped") === 23.0) // 3*1 + 2*10
    assert(r.getAs[Double]("clamp_loss_pct") === 44.4444)
  }

  test("duplicate timestamps resolve by event_id: the kept rows are the " +
    "SMALLEST ids, not arbitrary ones") {
    val t = ts("2024-01-01 00:00:00")
    // same user, same type, same ts; values distinguish which survived
    val rows = Seq(
      (30L, t, 1L, "view", 100.0, "{}"),
      (10L, t, 1L, "view", 1.0, "{}"),
      (20L, t, 1L, "view", 10.0, "{}"))
    val out = CappedContribution.cappedRelease(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      cap = 2).collect().head
    assert(out.getAs[Double]("sum_value_capped") === 11.0) // ids 10 + 20
  }

  test("a corpus under the cap releases unchanged (zero loss)") {
    val rows = Seq(
      (0L, ts("2024-01-01 00:00:00"), 1L, "click", 2.5, "{}"),
      (1L, ts("2024-01-01 00:01:00"), 1L, "view", 1.5, "{}"))
    val out = CappedContribution.cappedRelease(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      cap = 10).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_rows_capped"))
      assert(r.getAs[Double]("sum_value") ===
        r.getAs[Double]("sum_value_capped"))
      assert(r.getAs[Double]("clamp_loss_pct") === 0.0)
    }
  }
}
