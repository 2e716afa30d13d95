package graft.graph

import graft.SparkSpec

/** Bellman–Ford contracts: multi-hop beats heavy direct edges, the
  * bounded-round envelope is exactly `rounds` edges deep, and unit
  * weights reduce to BFS hop counts.
  */
class WeightedPathsSpec extends SparkSpec {
  import spark.implicits._

  test("a cheaper two-hop path undercuts the direct edge") {
    // 1-2 (0.5), 2-3 (0.5), 1-3 (2.0): via 2 costs 1.0 < direct 2.0
    val edges = Seq((1L, 2L, 0.5), (2L, 3L, 0.5), (1L, 3L, 2.0))
      .toDF("u", "v", "w")
    val seeds = Seq(1L).toDF("id")
    val d = WeightedPaths.bellmanFord(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(d === Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
  }

  test("the envelope reaches exactly `rounds` edges") {
    val chain = (1L to 5L).map(i => (i, i + 1, 1.0)).toDF("u", "v", "w")
    val seeds = Seq(1L).toDF("id")
    val d4 = WeightedPaths.bellmanFord(chain, seeds, rounds = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(!d4.contains(6L), "vertex 5 edges out appeared within 4 rounds")
    assert(d4(5L) === 4.0)
    val d5 = WeightedPaths.bellmanFord(chain, seeds, rounds = 5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(d5(6L) === 5.0)
    // more rounds never worsen a settled distance
    d4.foreach { case (id, dist) => assert(d5(id) <= dist) }
  }

  test("unit weights reduce to BFS hop counts (undirected)") {
    // star + tail: 1-2, 1-3, 3-4
    val edges = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (3L, 4L, 1.0))
      .toDF("u", "v", "w")
    val seeds = Seq(4L).toDF("id")
    val d = WeightedPaths.bellmanFord(edges, seeds, rounds = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(d === Map(4L -> 0.0, 3L -> 1.0, 1L -> 2.0, 2L -> 3.0))
  }
}
