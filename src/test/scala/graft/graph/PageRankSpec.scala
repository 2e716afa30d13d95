package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  def ranksOf(edges: Seq[(String, String)]): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("cycle: uniform ranks, sum 1") {
    val r = ranksOf(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
  }

  test("star with dangling leaves: hub feeds leaves, mass conserved") {
    // a → b, c, d; leaves are dangling (their mass redistributes)
    val r = ranksOf(Seq(("a", "b"), ("a", "c"), ("a", "d")))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("b") > r("a")) // leaves accumulate the hub's full contribution
    assert(math.abs(r("b") - r("c")) < 1e-9 && math.abs(r("c") - r("d")) < 1e-9)
  }

  test("authority: the vertex everyone links to ranks highest") {
    val r = ranksOf(Seq(("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")))
    assert(r("z") == r.values.max)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("BFS shortest paths: hop counts, unreachable excluded, branches merge") {
    // a→b→c→d plus shortcut a→c; e→a unreachable FROM a; f isolated-ish
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "a"))
      .toDF("src", "dst")
    val d = PageRank.shortestPaths(edges, "a").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L)) // e absent
  }

  test("BFS refuses to return a truncated traversal") {
    val chain = (1 to 5).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    intercept[IllegalStateException] {
      PageRank.shortestPaths(chain, "n1", maxDepth = 3)
    }
    assert(PageRank.shortestPaths(chain, "n1").count() == 6)
  }

  test("runs on the FRIENDS_WITH projection (symmetric graph → degree-ish)") {
    val users = graft.etl.UserEtl.transform(jsonDf(graft.etl.Schemas.user,
      """{"user_id":"u1","name":"A","review_count":1,"yelping_since":"2015-01-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"u2, u3","fans":0,"average_stars":4.0}""",
      """{"user_id":"u2","name":"B","review_count":1,"yelping_since":"2015-01-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"u1","fans":0,"average_stars":4.0}""",
      """{"user_id":"u3","name":"C","review_count":1,"yelping_since":"2015-01-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"u1","fans":0,"average_stars":4.0}"""),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val fw = GraphExport.friendsWith(users)
    val r = PageRank.run(fw).collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("u1") > r("u2")) // u1 has degree 2, the others degree 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }
}
