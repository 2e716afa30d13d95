package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MstSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory Kruskal under the same (w, u, v) total order — the
    * third algorithm (the engine runs Borůvka, the oracle the cut
    * property).
    */
  private def kruskal(edges: Seq[(Long, Long, Double)]): Set[(Long, Long, Double)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    for (e <- edges.sortBy(e => (e._3, e._1, e._2))) {
      val (ru, rv) = (find(e._1), find(e._2))
      if (ru != rv) { parent(ru) = rv; out += e }
    }
    out.toSet
  }

  private def collectEdges(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().toSet.map((r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("boruvka equals Kruskal on seeded random graphs (duplicate " +
    "weights resolved by the lexicographic tie-break)") {
    for (seed <- Seq(11L, 23L, 37L)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      // ~3 edges/vertex; weights from a SMALL set so ties are everywhere
      val edges = (0 until 180).map { _ =>
        val u = rnd.nextInt(n).toLong
        val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v), (1 + rnd.nextInt(5)) / 10.0)
      }.filter(e => e._1 != e._2).distinct
      val got = collectEdges(Mst.boruvka(edges.toDF("u", "v", "w")))
      assert(got == kruskal(edges), s"seed $seed")
    }
  }

  test("path graph: the whole path is the MST; cycle: the (w,u,v)-max " +
    "edge is dropped") {
    val path = Seq((1L, 2L, 0.5), (2L, 3L, 0.1), (3L, 4L, 0.9))
    assert(collectEdges(Mst.boruvka(path.toDF("u", "v", "w"))) == path.toSet)
    val cycle = path :+ ((1L, 4L, 0.9)) // ties with (3,4,0.9); (3,4) loses
    assert(collectEdges(Mst.boruvka(cycle.toDF("u", "v", "w"))) ==
      Set((1L, 2L, 0.5), (2L, 3L, 0.1), (1L, 4L, 0.9)))
  }

  test("disconnected graph yields a forest: one tree per component, " +
    "|edges| = |vertices| - |components|") {
    val edges = Seq((1L, 2L, 0.3), (2L, 3L, 0.2), (1L, 3L, 0.4), // comp A
      (10L, 11L, 0.1), (11L, 12L, 0.5), (10L, 12L, 0.5))          // comp B
    val got = collectEdges(Mst.boruvka(edges.toDF("u", "v", "w")))
    assert(got.size == 4, s"6 vertices, 2 components => 4 edges; got $got")
    assert(got == kruskal(edges))
  }

  test("empty edge set converges to an empty forest") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("u", "v", "w")
    assert(Mst.boruvka(empty).isEmpty)
  }

  test("q161 on the real corpus: acyclic (edge count check), spans the " +
    "q40-labeled components, and total weight matches Kruskal") {
    val dir = "/root/testdata/sf0.001"
    val edges = WeightedPaths.weightedEdges(spark, dir, maxDf = 18)
    val es = edges.collect().toSeq.map(r =>
      (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Double]("w")))
    val got = collectEdges(Mst.mstQuery(spark, dir)
      .select(col("cust_u"), col("cust_v"), col("w")))
    val want = kruskal(es)
    assert(got == want)
    // forest law: |edges| = |vertices| - |components|
    val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.size
    val comps = graft.dedup.Dedup.connectedComponents(
      edges.select(col("u").as("id_a"), col("v").as("id_b")))
      .select(col("cluster_id")).distinct().count()
    assert(got.size.toLong == verts - comps)
  }
}
