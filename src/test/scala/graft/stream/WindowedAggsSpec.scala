package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowedAggsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val events = Seq(
    (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
    (1L, ts("2024-01-01 10:20:00"), "click", 2.0),
    (2L, ts("2024-01-01 10:50:00"), "purchase", 10.0),
    (1L, ts("2024-01-01 11:10:00"), "click", 3.0),
    (2L, ts("2024-01-01 13:00:00"), "purchase", 20.0))
    .toDF("user_id", "ts", "event_type", "value")

  test("tumbling windows: correct bounds and per-window aggregates") {
    val out = WindowedAggs.tumbling(events, "1 hour").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 10:00:00.0", "purchase", 1L, 10.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 3.0),
      ("2024-01-01 13:00:00.0", "purchase", 1L, 20.0)))
  }

  test("sliding windows: an event lands in windowLen/slide overlapping windows") {
    val out = WindowedAggs.sliding(events, "1 hour", "30 minutes")
      .filter(col("event_type") === "purchase")
      .collect().map(r => r.getTimestamp(0).toString).sorted
    // the 10:50 purchase appears in windows starting 10:00 and 10:30
    assert(out.count(_.startsWith("2024-01-01 10:")) == 2)
  }

  test("sessionizeAll: every closed session emitted, not just the last") {
    val ds = events.as[WindowedAggs.Event]
    val sessions = WindowedAggs.sessionizeAll(spark, ds, gapMs = 30 * 60 * 1000L)
      .collect().groupBy(_.user_id)
    // user 1: {10:05,10:20} then {11:10} — two sessions
    val u1 = sessions(1L).sortBy(_.session_start.getTime)
    assert(u1.length == 2)
    assert(u1(0).n_events == 2 && u1(0).total_value == 3.0)
    assert(u1(0).session_end == ts("2024-01-01 10:20:00"))
    assert(u1(1).n_events == 1 && u1(1).total_value == 3.0)
    // user 2: {10:50} and {13:00}
    assert(sessions(2L).length == 2)
    assert(sessions(2L).map(_.total_value).sorted.toSeq == Seq(10.0, 20.0))
  }

  test("sessionize: gap rule splits sessions, state folds within gap") {
    val ds = events.as[WindowedAggs.Event]
    val sessions = WindowedAggs.sessionize(spark, ds, gapMs = 30 * 60 * 1000L)
      .collect().map(s => s.user_id -> s).toMap
    // user 1: 10:05, 10:20, 11:10 — 50min gap splits; last session = 11:10 alone
    assert(sessions(1L).n_events == 1)
    assert(sessions(1L).session_start == ts("2024-01-01 11:10:00"))
    // user 2: 10:50 then 13:00 — split; last session = 13:00
    assert(sessions(2L).n_events == 1)
    assert(sessions(2L).total_value == 20.0)
    // within-gap fold: tighten to one session
    val oneSession = WindowedAggs.sessionize(spark,
      events.filter(col("user_id") === 1L && col("ts") < ts("2024-01-01 11:00:00"))
        .as[WindowedAggs.Event], gapMs = 30 * 60 * 1000L)
      .collect().head
    assert(oneSession.n_events == 2 && oneSession.total_value == 3.0)
  }
}
