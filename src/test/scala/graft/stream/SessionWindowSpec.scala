package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native session_window contracts: the boundary rule (an exact-gap
  * pair MERGES — measured, matching the engine's `diff > gap` cut),
  * end = last event + gap, and the just-past-gap split.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("exact-gap pair merges under BOTH session_window and the engine cut") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0)) // exactly the 30-minute gap
      .toDF("user_id", "ts", "value")
    val sw = WindowedAggs.sessionWindowAgg(rows, "30 minutes").collect()
    assert(sw.length === 1,
      "session_window merges a pair exactly gap apart (measured boundary)")
    assert(sw.head.getAs[Long]("n_events") === 2L)
    // the engine's typed sessionizer cuts on diff > gap -> also one
    val evs = Seq(
      Sessionize.Ev(1L, 10L, ts("2024-01-01 10:00:00").getTime * 1000L),
      Sessionize.Ev(1L, 11L, ts("2024-01-01 10:30:00").getTime * 1000L)).toDS()
    val eng = Sessionize.sessions(evs).collect()
    assert(eng.length === 1, "the engine cut merges an exact-gap pair")
    // one microsecond past the gap: session_window splits
    val past = Seq(
      (1L, new Timestamp(ts("2024-01-01 10:00:00").getTime), 1.0),
      (1L, Timestamp.from(ts("2024-01-01 10:30:00").toInstant.plusNanos(1000)), 2.0))
      .toDF("user_id", "ts", "value")
    assert(WindowedAggs.sessionWindowAgg(past, "30 minutes").collect()
      .length === 2)
  }

  test("window end is the last event plus the gap, and in-gap events merge") {
    val rows = Seq(
      (7L, ts("2024-01-01 09:00:00"), 1.5),
      (7L, ts("2024-01-01 09:29:59"), 2.5), // merges (diff < gap)
      (7L, ts("2024-01-01 11:00:00"), 4.0)) // new session
      .toDF("user_id", "ts", "value")
    val sw = WindowedAggs.sessionWindowAgg(rows, "30 minutes")
      .orderBy("session_start").collect()
    assert(sw.length === 2)
    assert(sw.head.getAs[Timestamp]("session_start") === ts("2024-01-01 09:00:00"))
    assert(sw.head.getAs[Timestamp]("session_end") === ts("2024-01-01 09:59:59"))
    assert(sw.head.getAs[Long]("n_events") === 2L)
    assert(sw.head.getAs[Double]("total_value") === 4.0)
    assert(sw.last.getAs[Timestamp]("session_end") === ts("2024-01-01 11:30:00"))
  }
}
