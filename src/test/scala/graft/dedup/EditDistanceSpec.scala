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

  def segmented(df: org.apache.spark.sql.DataFrame, maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.editDistancePairsSegmented(df, "brand", "id", "name", maxDist)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  def naive(df: org.apache.spark.sql.DataFrame, maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.editDistancePairs(df, "brand", "id", "name", maxDist)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("segmented (PassJoin) path ≡ naive block join on the fixture") {
    for (d <- 0 to 3) assert(segmented(recs, d) == naive(recs, d), s"d=$d")
  }

  def byText(df: org.apache.spark.sql.DataFrame, maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.editDistancePairsByText(df, "brand", "id", "name", maxDist)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("distinct-text mining + expansion ≡ naive block join on the fixture") {
    for (d <- 0 to 3) assert(byText(recs, d) == naive(recs, d), s"d=$d")
  }

  test("segmented ≡ naive on a generated corpus incl. short strings") {
    // deterministic mutation corpus: seeds + 1-3 char edits of seeds, some
    // strings at/below d (the catch-all path), across two blocks
    val seeds = Seq("kettle", "whisk", "abcdefgh", "ab", "a", "", "spatula")
    val variants = for {
      (s, si) <- seeds.zipWithIndex
      (v, vi) <- Seq(s, s + "x", s.drop(1), s.take(3) + "Z" + s.drop(4),
        s + "xy", "Q" + s).zipWithIndex
    } yield ((si * 10 + vi).toLong, if (si % 2 == 0) "b1" else "b2", v)
    val df = {
      import spark.implicits._
      variants.toDF("id", "brand", "name")
    }
    for (d <- 0 to 3) {
      assert(segmented(df, d) == naive(df, d), s"segmented d=$d")
      assert(byText(df, d) == naive(df, d), s"byText d=$d")
    }
  }
}
