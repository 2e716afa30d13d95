package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Harmonic-centrality contracts: exact ranking on a star (where HLL
  * ball sizes are exact — every ball is far below the sketch error
  * regime's onset because estimates round to the true small counts
  * only if the registers happen to — so the star test checks ORDER,
  * not values), the path-graph order, and query-level sanity.
  */
class HarmonicSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    val e = pairs.toDF("u", "v")
    e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
  }

  test("star graph: the hub is the single most central vertex") {
    // hub 100 connected to 10 leaves; leaves reach each other at d=2.
    val star = edges((1L to 10L).map(i => (100L, i)): _*)
    val top = Harmonic.topCentral(star, hops = 2, k = 11).collect()
    assert(top.head.getLong(0) === 100L)
    // every leaf has the same integer numerator (symmetry)
    assert(top.tail.map(_.getLong(2)).distinct.length === 1)
  }

  test("path graph: centrality decreases from the middle outward") {
    val path = edges((1L to 6L).map(i => (i, i + 1)): _*)
    val rows = Harmonic.topCentral(path, hops = 6, k = 7).collect()
    val rank = rows.map(_.getLong(0)).zipWithIndex.toMap
    // middle vertex 4 ranks above the endpoints 1 and 7
    assert(rank(4L) < rank(1L) && rank(4L) < rank(7L))
  }

  test("q187 on testdata: 20 rows, h_num descending, harmonic = h_num/6") {
    val rows = Harmonic.harmonicQuery(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 20)
    val hn = rows.map(_.getLong(2))
    assert(hn.zip(hn.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / 6.0) < 1e-4)
      assert(r.getLong(2) >= 0L)
    }
  }
}
