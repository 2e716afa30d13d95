package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  val points = Seq(
    (1L, "A", 5L), (2L, "A", 10L), (3L, "A", 15L), (4L, "B", 5L))
    .toDF("pid", "k", "t")
  val intervals = Seq(
    (100L, "A", 0L, 10L),    // [0, 10) — end exclusive
    (101L, "A", 10L, 20L),   // [10, 20)
    (102L, "A", 0L, 20L),    // spans several buckets
    (103L, "B", 100L, 200L)) // no points inside
    .toDF("iid", "k", "start", "end")

  def matches(bucketWidth: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, "k", "t", "start", "end",
        bucketWidth)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("point-in-interval: inclusive start, exclusive end, key-scoped") {
    val expected = Set(
      (1L, 100L), (1L, 102L),          // t=5 ∈ [0,10) and [0,20)
      (2L, 101L), (2L, 102L),          // t=10: end-exclusive of 100, start of 101
      (3L, 101L), (3L, 102L))          // t=15
    assert(matches(bucketWidth = 7L) == expected)
  }

  test("bucket width does not change semantics (1, 3, 1000)") {
    val ref = matches(7L)
    assert(matches(1L) == ref)
    assert(matches(3L) == ref)
    assert(matches(1000L) == ref) // everything in one bucket still works
  }

  test("inverted/empty intervals match nothing and do not explode") {
    // sequence(lo, hi) is DESCENDING for hi < lo — a swapped-bounds row
    // must be filtered out, not exploded into |span|/width bucket rows
    val bad = Seq(
      (200L, "A", 1000000L, 0L), // inverted: would be 10^6/7 bucket rows
      (201L, "A", 5L, 5L))       // empty
      .toDF("iid", "k", "start", "end")
    val out = RangeJoin.pointInInterval(points, bad, "k", "t", "start", "end",
      bucketWidth = 7L)
    assert(out.count() == 0)
    // and the exploded side is empty, not merely filtered post-hoc
    val exploded = bad.filter(col("end") > col("start")).count()
    assert(exploded == 0)
  }

  test("interval overlap: exactly-once across buckets, half-open endpoints") {
    val left = Seq(
      (1L, "A", 0L, 10L),     // overlaps 11, 13; touches 12 at the boundary
      (2L, "A", 50L, 100L),   // long: shares MANY buckets with 13
      (3L, "B", 0L, 10L))     // other key
      .toDF("aid", "k", "sa", "ea")
    val right = Seq(
      (11L, "A", 5L, 7L),     // inside 1
      (12L, "A", 10L, 20L),   // touches 1 at t=10 → NO overlap (half-open)
      (13L, "A", 8L, 99L),    // overlaps 1 and 2; spans many buckets
      (14L, "B", 20L, 30L))   // no overlap on B
      .toDF("bid", "k", "sb", "eb")
    def pairs(w: Long): Seq[(Long, Long)] =
      RangeJoin.intervalOverlap(left, right, "k", "sa", "ea", "sb", "eb", w)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    val expected = Seq((1L, 11L), (1L, 13L), (2L, 13L))
    // exactly-once even when a pair shares dozens of buckets (w=3 → the
    // (2,13) pair shares ~16 buckets; the max-start-bucket filter must
    // keep exactly one copy), and width-independent semantics
    assert(pairs(3L) == expected)
    assert(pairs(7L) == expected)
    assert(pairs(1000L) == expected)
    // inverted interval on either side is dropped, not exploded
    val bad = Seq((9L, "A", 10L, 0L)).toDF("aid", "k", "sa", "ea")
    assert(RangeJoin.intervalOverlap(bad, right, "k", "sa", "ea", "sb", "eb", 3L)
      .count() == 0)
  }

  test("plan: equi-join on (key, bucket), never a nested-loop/cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val df = RangeJoin.pointInInterval(points, intervals, "k", "t", "start",
      "end", 7L)
    val bad = PlanWalk.collectPlan(df.queryExecution.executedPlan) {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, df.queryExecution.executedPlan.toString)
  }
}
