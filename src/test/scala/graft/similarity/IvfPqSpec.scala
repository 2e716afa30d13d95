package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ contracts: the composition law (every returned neighbor
  * lives in a list its query probed), residual geometry (residual
  * norms are far smaller than vector norms once the coarse layer has
  * explained the clusters — the reason residual PQ beats raw PQ), and
  * retrieval quality on clustered data.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def clustered = {
    val rnd = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(10)(unit())
    (0 until 200).map { i =>
      val c = i % 10
      // 0.05/dim noise -> within-cluster radius ~0.37 on the unit
      // sphere (64 dims), far inside the ~1.41 cross-cluster spacing
      val noisy = centers(c).map(_ + 0.05 * rnd.nextGaussian())
      val n = math.sqrt(noisy.map(x => x * x).sum)
      (i.toLong, noisy.map(x => (x / n).toFloat).toSeq, c)
    }.toDF("vec_id", "embedding", "label")
  }

  test("composition law: every returned neighbor is in a list its " +
    "query probed, and its ADC distance is the probed-list residual sum") {
    val emb = graft.Tables.embeddings(spark, dir)
    val coarse = Similarity.kmeansCentroids(emb, IvfPq.NList, iters = 2)
      .localCheckpoint()
    val lists = Similarity.ivfAssign(emb, coarse, nprobe = 1)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val probes = Similarity
      .ivfAssign(emb.filter(col("vec_id") < IvfPq.NQueries), coarse, IvfPq.NProbe)
      .select(col("vec_id"), col("centroid_id")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val out = IvfPq.ivfPqTopK(emb).collect()
    assert(out.length === IvfPq.NQueries * IvfPq.TopK)
    out.foreach { r =>
      val (q, nb) = (r.getLong(0), r.getLong(2))
      assert(probes(q).contains(lists(nb)),
        s"neighbor $nb of query $q is in unprobed list ${lists(nb)}")
      assert(r.getLong(3) >= 0L)
    }
  }

  test("residual geometry on clustered data: coarse centroids explain " +
    "most of the vector — residual norms are small") {
    val emb = clustered
    val coarse = Similarity.kmeansCentroids(emb, IvfPq.NList, iters = 2)
    val resNorm = IvfPq.residuals(emb, coarse)
      .select(sqrt(aggregate(col("res"), lit(0.0),
        (a, x) => a + x * x)).as("rn"))
      .agg(avg(col("rn"))).collect()(0).getDouble(0)
    // unit vectors; 10 tight clusters, 16 lists -> residuals ≪ 1
    assert(resNorm < 0.5, s"mean residual norm $resNorm")
  }

  test("IVF-PQ retrieval on clustered data: top-5 stays in-cluster") {
    val out = IvfPq.ivfPqTopK(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.nonEmpty)
    val inCluster = out.count { case (q, nb) => nb % 10 == q % 10 }
    val precision = inCluster.toDouble / out.length
    assert(precision >= 0.9,
      s"in-cluster precision@5 $precision ($inCluster/${out.length})")
  }
}
