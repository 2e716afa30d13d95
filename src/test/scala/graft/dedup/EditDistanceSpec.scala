package graft.dedup

import graft.SparkSpec

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  val recs = Seq(
    (1L, "b1", "kettle"),
    (2L, "b1", "kettles"),   // dist 1 from kettle
    (3L, "b1", "kettle xx"), // dist 3 from kettle — beyond maxDist 2
    (4L, "b2", "kettle"),    // other block: never compared with id 1
    (5L, "b1", "whisk"),
    (6L, "b1", "kettle"),    // exact duplicate of id 1 (dist 0)
    (7L, "b1", "kettleXY")   // len diff exactly 2, dist exactly 2: must
                             // survive the length pre-filter at the boundary
  ).toDF("id", "brand", "name")

  def pairs(maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.editDistancePairs(recs, "brand", "id", "name", maxDist)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("blocking, threshold, and exact distances") {
    assert(pairs(2) == Set(
      (1L, 2L, 1L), (1L, 6L, 0L), (2L, 6L, 1L),
      (1L, 7L, 2L), (2L, 7L, 2L), (6L, 7L, 2L)))
  }

  test("maxDist 0 degenerates to exact-match pairs within the block") {
    assert(pairs(0) == Set((1L, 6L, 0L)))
  }

  test("cross-block identical strings never pair") {
    assert(!pairs(2).exists { case (a, b, _) => Set(a, b).contains(4L) })
  }
}
