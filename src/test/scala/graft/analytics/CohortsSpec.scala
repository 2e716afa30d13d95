package graft.analytics

import java.sql.Timestamp
import graft.SparkSpec

class CohortsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.map { case (u, ts) => (u, Timestamp.valueOf(ts)) }
      .toDF("user_id", "ts")

  test("retention triangle matches a hand-computed cohort") {
    // week of 2024-01-01 (Mon): users 1,2,3 start; week of 01-08: 1,2 return,
    // user 4 starts; week of 01-15: only 1 returns
    val d = ev(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-02 10:00:00"),
      (3L, "2024-01-03 10:00:00"),
      (1L, "2024-01-08 10:00:00"), (2L, "2024-01-09 10:00:00"),
      (4L, "2024-01-10 10:00:00"),
      (1L, "2024-01-15 10:00:00"))
    val m = Cohorts.retention(d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(m(("2024-01-01", 0L)) === ((3L, 3L, 1.0)))
    assert(m(("2024-01-01", 1L)) === ((2L, 3L, 0.6667)))
    assert(m(("2024-01-01", 2L)) === ((1L, 3L, 0.3333)))
    assert(m(("2024-01-08", 0L)) === ((1L, 1L, 1.0)))
    assert(m.size === 4)
  }

  test("multiple events in one week count the user once") {
    val d = ev(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 11:00:00"),
      (1L, "2024-01-05 12:00:00"))
    val r = Cohorts.retention(d).collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === 1L, "n_active dedups within the week")
  }
}
