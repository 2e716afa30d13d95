package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val m = Triangles.perVertexTriangles(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache() // perVertexTriangles caches the oriented edges
    m
  }

  test("single triangle with a pendant edge") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4: every vertex sits in 3 of the 4 triangles") {
    val e = for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i.toLong, j.toLong)
    assert(counts(e) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star graph has no triangles (the skewed hub the orientation tames)") {
    assert(counts((2 to 40).map(i => (1L, i.toLong))).isEmpty)
  }

  test("two triangles sharing an edge") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
      == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    val verts = 1 to 24
    val edges = for {
      i <- verts; j <- verts if i < j && (i * 31 + j) % 7 < 2
    } yield (i.toLong, j.toLong)
    val es = edges.toSet
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- verts; b <- verts if a < b; c <- verts if b < c
      if es((a.toLong, b.toLong)) && es((b.toLong, c.toLong)) && es((a.toLong, c.toLong))
    } {
      brute(a.toLong) += 1; brute(b.toLong) += 1; brute(c.toLong) += 1
    }
    assert(brute.nonEmpty) // the generator actually planted triangles
    assert(counts(edges) == brute.toMap)
  }
}
