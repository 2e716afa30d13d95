package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) = {
    val b = pairs.toDF("src", "dst")
    b.union(b.select($"dst".as("src"), $"src".as("dst")))
  }

  test("2-core of a triangle with a pendant: pendant and its path peel off") {
    // triangle 1-2-3 plus chain 3-4-5: peeling 5 (deg 1) drops 4 to deg 1,
    // which peels next round — the CASCADE case a single pass would miss
    val e = undirected((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val out = KCore.kcore(e, k = 2, maxRounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k above max degree yields an empty core, not an error") {
    val e = undirected((1L, 2L), (2L, 3L))
    assert(KCore.kcore(e, k = 5, maxRounds = 10).count() == 0)
  }

  test("a clique is its own k-core for k = size − 1") {
    val vs = 1L to 5L
    val e = undirected(vs.flatMap(a => vs.filter(_ > a).map(a -> _)): _*)
    val out = KCore.kcore(e, k = 4, maxRounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 5 && out.forall(_._2 == 4L))
  }

  test("path graph: maxRounds too small for the O(n) peel cascade throws") {
    // a 12-vertex path under k=2 peels two endpoints per round — needs 6
    val e = undirected((1L to 11L).map(i => i -> (i + 1)): _*)
    val ex = intercept[IllegalStateException] {
      KCore.kcore(e, k = 2, maxRounds = 3)
    }
    assert(ex.getMessage.contains("maxRounds"))
    // with enough rounds the same peel converges (to the empty core)
    assert(KCore.kcore(e, k = 2, maxRounds = 10).count() == 0)
  }
}
