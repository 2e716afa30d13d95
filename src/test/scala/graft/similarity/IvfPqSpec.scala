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

  test("q212 recall curve: recall is monotone non-decreasing in nprobe, " +
    "every leg returns a full top-k, and clustered data nears 1.0") {
    // the driver corpus (near-uniform noise): monotone is the contract
    val drv = IvfPq.recallCurve(graft.Tables.embeddings(spark, dir))
      .collect().map(r => (r.getInt(0), r.getAs[Long]("n_returned"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("n_hits_ref"),
        r.getAs[Long]("n_total")))
    assert(drv.map(_._1).toSeq === IvfPq.RecallProbes)
    drv.foreach { case (np, ret, hits, hitsRef, total) =>
      assert(ret === total, s"nprobe $np returned $ret of $total")
      assert(hits >= 0L && hits <= total)
      // the two-stage dominance law: the exact re-rank of an ADC
      // shortlist can never LOSE a truth hit the ADC top-k had
      assert(hitsRef >= hits,
        s"refined recall fell below ADC at nprobe $np: $hitsRef < $hits")
    }
    drv.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3,
        s"recall fell ${a._3} -> ${b._3} at nprobe ${a._1} -> ${b._1}")
    }
    // resolvable data: recall@k is only a fair PQ target when the
    // exact top-k is separated at code resolution — inside a tight
    // 20-member cluster the residual codes collapse and membership is
    // noise-ranked (the q207 Spearman lesson). 40 clusters of 5: the 4
    // same-cluster peers are the resolvable top-4 (cross-cluster gap
    // ~1.4 vs ~0.1 within), the 5th is noise — so full-probe recall
    // must clear 4/5 minus routing slack
    val rnd = new scala.util.Random(13)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(40)(unit())
    val small = (0 until 200).map { i =>
      val c = centers(i % 40).map(_ + 0.03 * rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      (i.toLong, c.map(x => (x / n).toFloat).toSeq, i % 40)
    }.toDF("vec_id", "embedding", "label")
    val cl = IvfPq.recallCurve(small).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_hits"),
        r.getAs[Long]("n_hits_ref"), r.getAs[Long]("n_total")))
    cl.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"clustered recall fell at nprobe ${b._1}")
    }
    cl.foreach { case (np, hits, hitsRef, _) =>
      assert(hitsRef >= hits, s"refined < ADC at clustered nprobe $np")
    }
    val last = cl.maxBy(_._1)
    assert(last._2.toDouble / last._4 >= 0.7,
      s"clustered recall@nprobe=${last._1} = ${last._2}/${last._4}")
  }

  test("two-stage search: the shortlist contains the ADC top-k, the " +
    "refined result is the exact-L2 top-k OF the shortlist, and the " +
    "refined distances are true float distances (not ADC estimates)") {
    val emb = graft.Tables.embeddings(spark, dir)
    val idx = IvfPq.sharedIndex(spark, dir)
    val np = IvfPq.NProbe
    val adc = IvfPq.searchTopK(emb, idx, np).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ref = IvfPq.searchRefined(emb, idx, np).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly k rows per query, ranks 1..k, strictly ordered distances
    ref.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to IvfPq.TopK),
        s"query $q ranks ${rows.map(_._2).toSeq}")
      assert(rows.sortBy(_._2).map(r => (r._4, r._3)).toSeq
        == rows.map(r => (r._4, r._3)).sortBy(identity).toSeq,
        s"query $q not (dist, id)-ordered")
    }
    // every refined distance equals the exact L2 truth for that pair
    val exact = IvfPq.exactTopK(emb)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    ref.foreach { case (q, _, n, d) =>
      exact.get((q, n)).foreach(t =>
        assert(t == d, s"refined dist for ($q,$n): $d != exact $t"))
    }
    // dominance mechanics: an ADC hit that is a true neighbor stays
    val truth = exact.keySet
    val refSet = ref.map(r => (r._1, r._3)).toSet
    assert((adc intersect truth).subsetOf(refSet),
      "the re-rank dropped a true neighbor the ADC top-k already had")
  }

  test("the (session, dir) index memo serves q208 and q212 the identical " +
    "build: searchTopK over sharedIndex equals a one-shot ivfPqTopK") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir)
    val i1 = IvfPq.sharedIndex(spark, dir)
    assert(i1 eq IvfPq.sharedIndex(spark, dir), "second call must hit the memo")
    val viaMemo = IvfPq.searchTopK(emb, i1, IvfPq.NProbe).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val oneShot = IvfPq.ivfPqTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viaMemo.toSeq == oneShot.toSeq,
      "memoized index must reproduce the from-scratch search exactly")
  }
}
