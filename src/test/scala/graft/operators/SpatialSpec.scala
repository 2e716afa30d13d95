package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded random integer points, including negatives (cells below 0). */
  private def randomPoints(seed: Long, n: Int): Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, (rnd.nextInt(2000) - 500).toDouble,
        (rnd.nextInt(2000) - 500).toDouble)
    }
  }

  private def brute(pts: Seq[(Long, Double, Double)],
                    r: Double): Set[(Long, Long, Double)] =
    (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet

  private def collectPairs(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().toSeq.map(r => (r.getAs[Long]("id_a"),
      r.getAs[Long]("id_b"), r.getAs[Double]("dist2")))

  test("radiusPairs equals the brute-force join on seeded random clouds " +
    "(negative coordinates included), with no duplicate pairs") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val pts = randomPoints(seed, 250)
      val df = pts.toDF("id", "x", "y")
      val got = collectPairs(
        Spatial.radiusPairs(df, "id", "x", "y", radius = 60.0, cellSize = 64.0))
      assert(got.size == got.toSet.size,
        s"seed $seed: the 5-replica cover emitted a duplicate pair")
      assert(got.toSet == brute(pts, 60.0), s"seed $seed: blocking mismatch")
    }
  }

  test("exact-boundary pair (dist2 == r^2) is included; one past it is not") {
    // (0,0)-(120,160): 120^2+160^2 = 40000 = 200^2 exactly; (0,0)-(121,160)
    // lands just outside. Closed predicate => first in, second out.
    val df = Seq((1L, 0.0, 0.0), (2L, 120.0, 160.0), (3L, 121.0, 160.0))
      .toDF("id", "x", "y")
    val got = collectPairs(
      Spatial.radiusPairs(df, "id", "x", "y", radius = 200.0, cellSize = 256.0))
    assert(got.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (2L, 3L)), s"got $got") // 2-3 dist2 = 1
    assert(got.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 40000.0)
  }

  test("cross-cell pair straddling a cell border is caught in every " +
    "direction (the 5-offset half-plane covers all 8 neighbors)") {
    // center point at a cell corner's inside edge, 8 neighbors one step
    // into each adjacent cell (cellSize 16, r 4: every pair within one
    // cell step on each axis, all 8 directions exercised).
    val center = (0L, 15.0, 15.0)
    val dirs = Seq((1L, 17.0, 15.0), (2L, 13.0, 15.0), (3L, 15.0, 17.0),
      (4L, 15.0, 13.0), (5L, 17.0, 17.0), (6L, 13.0, 13.0),
      (7L, 17.0, 13.0), (8L, 13.0, 17.0))
    val df = (center +: dirs).toDF("id", "x", "y")
    val got = collectPairs(
      Spatial.radiusPairs(df, "id", "x", "y", radius = 4.0, cellSize = 16.0))
    val withCenter = got.filter(p => p._1 == 0L).map(_._2).toSet
    assert(withCenter == (1L to 8L).toSet,
      s"missed a neighbor direction: $withCenter")
  }

  test("cellSize < radius is refused (the no-false-negative precondition)") {
    val df = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Spatial.radiusPairs(df, "id", "x", "y", radius = 100.0, cellSize = 64.0)
    }
    assert(e.getMessage.contains("cellSize"))
  }

  test("cellDensity partitions the points: counts sum to n, centroids " +
    "are the exact per-cell means, negatives bucket by floor") {
    val pts = randomPoints(7L, 300)
    val df = pts.toDF("id", "x", "y")
    val cells = Spatial.cellDensity(df, "x", "y", 64.0).collect()
    assert(cells.map(_.getAs[Long]("n")).sum == 300L)
    val byCell = pts.groupBy(p =>
      (math.floor(p._2 / 64.0).toLong, math.floor(p._3 / 64.0).toLong))
    for (r <- cells) {
      val key = (r.getAs[Long]("cell_x"), r.getAs[Long]("cell_y"))
      val mine = byCell(key)
      assert(r.getAs[Long]("n") == mine.size.toLong)
      assert(r.getAs[Double]("avg_x") == mine.map(_._2).sum / mine.size,
        s"integer-valued mean must be exact at $key")
    }
    assert(cells.exists(_.getAs[Long]("cell_x") < 0L),
      "the seeded cloud must actually exercise negative cells")
  }

  test("boxJoin: closed edges, zero-count boxes kept, counts match a " +
    "direct filter") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0), (3L, 5.0, 5.0),
      (4L, 10.0, 11.0)).toDF("id", "x", "y")
    val boxes = Seq(("a", 0.0, 10.0, 0.0, 10.0), ("b", 50.0, 60.0, 0.0, 10.0))
      .toDF("box", "x_lo", "x_hi", "y_lo", "y_hi")
    val got = Spatial.boxJoin(pts, "x", "y", boxes, Seq("box")).collect()
      .map(r => r.getAs[String]("box") -> r.getAs[Long]("n_pts")).toMap
    // box a: (0,0) and (10,10) sit ON edges and count; (10,11) is out.
    assert(got == Map("a" -> 3L, "b" -> 0L), s"got $got")
  }

  test("haversineMeters: known city distance, symmetry, zero at identity") {
    val df = Seq(
      ("paris-london", 48.8566, 2.3522, 51.5074, -0.1278),
      ("equator-degree", 0.0, 0.0, 0.0, 1.0),
      ("self", 40.0, -75.0, 40.0, -75.0))
      .toDF("name", "lat1", "lon1", "lat2", "lon2")
      .withColumn("d", Spatial.haversineMeters(
        col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .withColumn("drev", Spatial.haversineMeters(
        col("lat2"), col("lon2"), col("lat1"), col("lon1")))
    val m = df.collect().map(r => r.getAs[String]("name") ->
      (r.getAs[Double]("d"), r.getAs[Double]("drev"))).toMap
    assert(math.abs(m("paris-london")._1 - 343.5e3) < 2e3,
      s"Paris-London ~343.5 km, got ${m("paris-london")._1}")
    // one degree of longitude at the equator: ~111.195 km on the sphere
    assert(math.abs(m("equator-degree")._1 - 111.195e3) < 200)
    assert(m("self")._1 == 0.0)
    assert(m.values.forall(v => v._1 == v._2), "haversine must be symmetric")
  }

  test("the q159 fixture straddles the radius boundary: work-point " +
    "offsets land on both sides of r=200") {
    val pts = Spatial.spatialPoints(spark, "/root/testdata/sf0.01")
    val home = pts.filter(col("id") % 2 === 0)
      .select((col("id") / 2).cast("long").as("k"), col("x"), col("y"))
    val work = pts.filter(col("id") % 2 === 1)
      .select(((col("id") - 1) / 2).cast("long").as("k"),
        col("x").as("wx"), col("y").as("wy"))
    val d2 = home.join(work, "k")
      .select(((col("x") - col("wx")) * (col("x") - col("wx")) +
        (col("y") - col("wy")) * (col("y") - col("wy"))).as("d2"))
    assert(d2.filter(col("d2") <= 40000.0).count() > 100)
    assert(d2.filter(col("d2") > 40000.0).count() > 100)
  }
}
