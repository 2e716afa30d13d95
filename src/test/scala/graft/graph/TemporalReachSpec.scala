package graft.graph

import java.sql.Timestamp

import graft.SparkSpec

/** Temporal-reachability contracts on hand graphs: time order gates
  * traversal (the case static BFS gets wrong), earliest arrival is
  * minimal, and the iteration reaches its fixed point within the
  * diameter.
  */
class TemporalReachSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("an edge that fired before arrival is NOT a path: static BFS " +
    "would reach 3, temporal reach must not") {
    // 1 -(t=10)-> 2, 2 -(t=5)-> 3: the 2->3 handoff predates arriving at 2
    val edges = Seq((1L, 2L, ts(10)), (2L, 3L, ts(5))).toDF("src", "dst", "t")
    val seeds = Seq((1L, ts(0))).toDF("u", "t")
    val out = TemporalReach.earliestArrival(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(2L) === ts(10))
  }

  test("earliest arrival takes the path that waits, not the first edge") {
    // 1->2 at 10 or 20; 2->3 at 15: going at 10 catches the 15 handoff
    val edges = Seq((1L, 2L, ts(10)), (1L, 2L, ts(20)), (2L, 3L, ts(15)))
      .toDF("src", "dst", "t")
    val seeds = Seq((1L, ts(0))).toDF("u", "t")
    val out = TemporalReach.earliestArrival(edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(out(2L) === ts(10))
    assert(out(3L) === ts(15))
  }

  test("fixed point within the diameter: an extra round changes nothing") {
    val edges = Seq((1L, 2L, ts(1)), (2L, 3L, ts(2)), (3L, 4L, ts(3)))
      .toDF("src", "dst", "t")
    val seeds = Seq((1L, ts(0))).toDF("u", "t")
    val r3 = TemporalReach.earliestArrival(edges, seeds, 3)
      .collect().map(_.toSeq).toSet
    val r4 = TemporalReach.earliestArrival(edges, seeds, 4)
      .collect().map(_.toSeq).toSet
    assert(r3 === r4)
  }

  test("handoff edges link only consecutive DIFFERENT users within a " +
    "(type, day) stream, at the next event's time") {
    val ev = Seq(
      (1L, ts(1), 10L, "click", 1.0, "{}"),
      (2L, ts(2), 10L, "click", 1.0, "{}"), // same user: no self edge
      (3L, ts(3), 11L, "click", 1.0, "{}"), // 10 -> 11 at ts(3)
      (4L, ts(4), 12L, "view", 1.0, "{}")   // other type: no edge
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = TemporalReach.handoffEdges(ev).collect()
    assert(e.length === 1)
    assert(e(0).getLong(0) === 10L && e(0).getLong(1) === 11L
      && e(0).getTimestamp(2) === ts(3))
  }

  test("q182 on testdata: seed arrives at its own first-event time and " +
    "every arrival is >= the seed's") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val first = ev.filter(col("user_id").isNotNull)
      .orderBy(col("ts"), col("event_id"))
      .select(col("user_id"), col("ts")).head()
    val out = TemporalReach.temporalReachQuery(spark, "/root/testdata/sf0.001")
      .collect()
    val arr = out.map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(arr(first.getLong(0)) === first.getTimestamp(1))
    assert(out.forall(_.getTimestamp(1).compareTo(first.getTimestamp(1)) >= 0))
    assert(out.length > 1, "the corpus should diffuse past the seed")
  }
}
