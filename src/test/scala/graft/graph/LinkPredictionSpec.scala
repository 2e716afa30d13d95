package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adamic–Adar contracts: hand-computed scores on planted shapes, the
  * hub-cap discipline, and the non-adjacency screen on real data.
  */
class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  test("path and square graphs score by hand") {
    // path 1-2-3: the only open wedge is (1,3) through 2, deg(2)=2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = LinkPrediction.adamicAdar(path, maxHub = 10, topK = 10).collect()
    assert(p.length === 1)
    assert((p.head.getLong(0), p.head.getLong(1)) === ((1L, 3L)))
    assert(p.head.getAs[Long]("common_neighbors") === 1L)
    assert(p.head.getAs[Double]("aa_score") ===
      math.round(1.0 / math.log(2.0) * 1e6) / 1e6)
    // square 1-2-3-4-1: both diagonals, two common neighbors each
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val d = LinkPrediction.adamicAdar(sq, maxHub = 10, topK = 10)
      .orderBy("u").collect()
    assert(d.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (2L, 4L)))
    d.foreach { r =>
      assert(r.getAs[Long]("common_neighbors") === 2L)
      assert(r.getAs[Double]("aa_score") ===
        math.round(2.0 / math.log(2.0) * 1e6) / 1e6)
    }
  }

  test("the hub cap drops wedges through over-degree middles, and only those") {
    // star: center 9 connected to 1..5 (deg 5); plus a 2-path 1-7-2
    val star = (1L to 5L).map(i => (i, 9L)) :+ (1L, 7L) :+ (2L, 7L)
    val edges = star.toDF("u", "v")
    val capped = LinkPrediction.adamicAdar(edges, maxHub = 4, topK = 100)
      .collect()
    // center 9 (deg 5) is capped out; the wedge through 7 (deg 2) and the
    // (7,9) wedges through 1 and 2 (deg 2 each) survive
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (7L, 9L)))
    val open = LinkPrediction.adamicAdar(edges, maxHub = 5, topK = 100)
      .collect()
    // uncapped: the C(5,2) star pairs join in; (1,2) now sums both middles
    assert(open.length === 11)
    val pair12 = open.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(pair12.getAs[Long]("common_neighbors") === 2L)
    assert(pair12.getAs[Double]("aa_score") ===
      math.round((1.0 / math.log(5.0) + 1.0 / math.log(2.0)) * 1e6) / 1e6)
  }

  test("predicted pairs are canonical and never existing edges (testdata)") {
    val dir = "/root/testdata/sf0.001"
    val edges = Triangles.coPurchaseEdges(spark, dir, maxDf = 18)
      .cache()
    val out = LinkPrediction.adamicAdar(edges, maxHub = 40, topK = 20)
    val back = out.join(edges, Seq("u", "v")).count()
    assert(back === 0L, "predicted an existing edge")
    out.collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"non-canonical pair: $r")
      assert(r.getAs[Long]("common_neighbors") >= 1L)
    }
    spark.catalog.clearCache()
  }
}
