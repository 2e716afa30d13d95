package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup screen semantics on planted corpora: per-group pruning to one
  * representative, the paper's non-transitive chain behavior, and the
  * trained-quantizer (k-means) path the oracle can't express.
  */
class SemDedupSpec extends SparkSpec {

  private def embDf(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def centDf(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("centroid_id", "centroid")
  }

  /** Unit vector in R^8 along axis `a`, rotated toward axis `b` by theta. */
  private def planted(a: Int, b: Int, theta: Double): Array[Float] = {
    val v = Array.fill(8)(0.0f)
    v(a) = math.cos(theta).toFloat
    v(b) = math.sin(theta).toFloat
    v
  }

  test("planted near-dup groups prune to one representative each") {
    // three groups of 5 near-copies around orthogonal axes (tiny angular
    // jitter, far above τ within a group, ~0 across groups) + 3 singletons
    val groups = for {
      g <- 0 until 3
      i <- 0 until 5
    } yield ((g * 5 + i).toLong, planted(g, 3, i * 0.02))
    val singles = (0 until 3).map(i =>
      ((100 + i).toLong, planted(4 + i, 3, 0.0)))
    val e = embDf(groups ++ singles)
    val cents = centDf((0 until 6).map(g =>
      (g.toLong, planted(if (g < 3) g else g + 1, 3, 0.0))))
    val out = SemDedup.semDedup(e, cents, tau = 0.95).collect()
    assert(out.length == 18)
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    // exactly one survivor per planted group…
    for (g <- 0 until 3)
      assert(kept.count(id => id >= g * 5 && id < g * 5 + 5) == 1,
        s"group $g should keep exactly one of its 5 near-copies")
    // …and every singleton survives
    assert(Set(100L, 101L, 102L).subsetOf(kept))
    assert(kept.size == 6)
  }

  test("screen is the paper's greedy, not transitive closure") {
    // chain at angles 0°/25°/50° in a plane, τ = 0.9: cos(25°) ≈ 0.906 ≥ τ
    // links the middle vector to both ends, but cos(50°) ≈ 0.64 < τ — the
    // two ends must BOTH survive (transitive closure would keep only one)
    def at(deg: Double) = planted(0, 1, math.toRadians(deg))
    val e = embDf(Seq((1L, at(0)), (2L, at(25)), (3L, at(50))))
    // one centroid at the middle direction: ends rank 1–2, middle rank 3
    val cents = centDf(Seq((0L, at(25))))
    val rows = SemDedup.semDedup(e, cents, tau = 0.9).collect()
    val kept = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"expected the chain ends, got $kept")
  }

  test("rank order keeps the farthest-from-centroid representative") {
    // centroid at 0°, vectors at 0°/5°/10°, all mutually ≥ τ: ascending
    // c_cos rank puts the 10° vector first (the paper keeps the LOW
    // centroid-similarity outlier), and it blocks both others
    def at(deg: Double) = planted(0, 1, math.toRadians(deg))
    val e = embDf(Seq((1L, at(0)), (2L, at(5)), (3L, at(10))))
    val cents = centDf(Seq((0L, at(0))))
    val kept = SemDedup.semDedup(e, cents, tau = 0.9).collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("nlist bounds the quadratic: max cluster size shrinks as nlist grows") {
    // the scaling knob the q106 demo now carries (nlist = max(8, n/64)):
    // growing the codebook must shrink the biggest cluster, because the
    // within-cluster screen is O(|cluster|²) and |cluster| — not n — is
    // what the knob controls
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    def maxCluster(nlist: Int): Long = {
      val cents = graft.similarity.Similarity.kmeansCentroids(e, nlist, iters = 2)
      graft.similarity.Similarity.ivfAssign(e, cents, nprobe = 1)
        .groupBy(col("centroid_id")).count()
        .agg(max(col("count"))).head().getLong(0)
    }
    val coarse = maxCluster(4)
    val fine = maxCluster(32)
    assert(coarse >= 500 / 4, s"pigeonhole: coarse=$coarse") // 500 vectors
    assert(fine < coarse, s"nlist=32 max cluster $fine !< nlist=4 max $coarse")
  }

  test("q134 floor: trained codebook dup-recall >= fixed codebook dup-recall on a planted corpus") {
    // 4 planted groups of 6 near-copies (24 vectors, 20 true duplicates)
    // plus 8 spread singletons. The q106 fixed codebook is the first
    // nlist vectors by id — here ids 0..7, i.e. SIX of the eight
    // centroids land inside groups 0 and 1, so groups 2 and 3 risk being
    // split across far-away centroids; the k-means codebook re-centers
    // on the actual clusters. Recall = dropped true duplicates / 20.
    val groups = for {
      g <- 0 until 4
      i <- 0 until 6
    } yield ((g * 6 + i).toLong, planted(g, 7, i * 0.02))
    val singles = (0 until 8).map(i =>
      ((100 + i).toLong, planted(4 + (i % 3), 7, 0.3 + 0.05 * i)))
    val e = embDf(groups ++ singles)
    val nlist = 8
    def dupRecall(cents: DataFrame): Double = {
      val kept = SemDedup.semDedup(e, cents, tau = 0.95).collect()
        .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
      val droppedInGroups = (0 until 24).count(id => !kept.contains(id.toLong))
      droppedInGroups / 20.0
    }
    // the q106-style fixed codebook: centroid c = embedding of vec_id c
    val fixed = centDf(groups.take(nlist).map { case (id, v) => (id, v) })
    val trained = graft.similarity.Similarity.kmeansCentroids(
      e.select(col("vec_id"), col("embedding")), nlist, iters = 2)
    val (rFixed, rTrained) = (dupRecall(fixed), dupRecall(trained))
    assert(rTrained >= rFixed,
      s"trained recall $rTrained < fixed recall $rFixed")
    // absolute floor, not exactly 1.0: a Lloyd cluster boundary may cut
    // one planted group (the screen is cluster-local by design)
    assert(rTrained >= 0.9, s"trained recall floor broken: $rTrained")
    // the TWO-LEVEL quantizer (q134's actual path) must hold the same
    // floors: approximate super-routing may only cost boundary cases
    val (supers, children) = graft.similarity.Similarity.hierQuantizer(
      e.select(col("vec_id"), col("embedding")), nlist, iters = 2)
    val assignedH = graft.similarity.Similarity.hierAssign(
      e.select(col("vec_id"), col("embedding")), supers, children)
    val keptH = SemDedup.screenAssigned(assignedH, tau = 0.95).collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val rHier = (0 until 24).count(id => !keptH.contains(id.toLong)) / 20.0
    assert(rHier >= rFixed, s"hier recall $rHier < fixed recall $rFixed")
    assert(rHier >= 0.9, s"hier recall floor broken: $rHier")
  }

  test("q134 runs on the real embeddings table: recall anchored to the brute-force tau-graph") {
    // the driver-visible entry, floored against GROUND TRUTH rather than
    // a slack constant on q106's kept count: brute-force the exact
    // cosine >= tau PAIR set over the full sf0.001 corpus (500 vectors —
    // 125k pairs on the driver) and measure PAIR RESOLUTION — the
    // fraction of tau-pairs with at least one endpoint dropped. A global
    // greedy screen resolves every pair (two kept endpoints would each
    // be the other's witness); a cluster-local screen only misses
    // cross-cluster pairs, so resolution is exactly the quantity the
    // trained codebook is supposed to improve. Unlike connected-
    // component counting, this does not credit chain transitivity the
    // screen deliberately lacks (see the non-transitive-closure test),
    // and unlike a kept-count slack constant it cannot drift with
    // k-means init order.
    val dir = "/root/testdata/sf0.001"
    val tau = 0.4
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val n = vecs.length
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val tauPairs = (for {
      i <- 0 until n; j <- i + 1 until n
      if cos(vecs(i)._2, vecs(j)._2) >= tau
    } yield (vecs(i)._1, vecs(j)._1)).toSeq
    assert(tauPairs.nonEmpty, "corpus has no tau-pairs; the floor is vacuous")

    def resolution(rows: Array[org.apache.spark.sql.Row]): Double = {
      val kept = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
      tauPairs.count { case (a, b) => !kept(a) || !kept(b) }.toDouble /
        tauPairs.size
    }
    val trained = SemDedup.semDedupTrainedQuery(spark, dir).collect()
    assert(trained.length == n)
    assert(trained.count(_.getBoolean(3)) > 0)
    val resTrained = resolution(trained)
    val resFixed = resolution(SemDedup.semDedupQuery(spark, dir).collect())
    // the trained two-level quantizer re-centers on the actual clusters;
    // the fixed first-nlist codebook does not — trained resolution may
    // not fall below fixed (same corpus, same tau-pair denominator)
    assert(resTrained >= resFixed,
      s"trained pair-resolution $resTrained < fixed $resFixed " +
        s"(${tauPairs.size} tau-pairs)")
    // absolute floor vs ground truth, deliberately loose: tau = 0.4
    // pairs on this corpus are 60°+ apart (the near-dup band tops out at
    // cosine ~0.5–0.6), so an 8-centroid cluster-local screen genuinely
    // cannot co-cluster them all — measured resolution is 0.4545 (30/66
    // pairs), bit-stable under the q134 determinism gate. 0.3 asserts
    // the screen resolves a non-trivial fraction of the exact pair mass
    // while leaving 50% headroom for legitimate quantizer changes; the
    // relative trained >= fixed assertion above carries the real claim.
    assert(resTrained >= 0.3,
      s"trained pair-resolution floor broken: $resTrained " +
        s"(${tauPairs.size} tau-pairs)")
  }

  test("trained (k-means) quantizer plugs into the same screen") {
    // same planted corpus, but the quantizer is learned from the data —
    // the oracle-inexpressible path: pruning must still collapse each
    // planted group to one representative
    val groups = for {
      g <- 0 until 3
      i <- 0 until 5
    } yield ((g * 5 + i).toLong, planted(g, 3, i * 0.02))
    val e = embDf(groups)
    val cents = graft.similarity.Similarity.kmeansCentroids(
      e.select(col("vec_id"), col("embedding")), nlist = 3, iters = 2)
    val out = SemDedup.semDedup(e, cents, tau = 0.95).collect()
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    for (g <- 0 until 3)
      assert(kept.count(id => id >= g * 5 && id < g * 5 + 5) == 1,
        s"group $g should keep exactly one representative")
  }

  test("q106 router: exact leg bit-for-bit at the boundary, trained leg " +
    "one step past it") {
    import graft.similarity.Similarity
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // 500 vecs → nlist = max(8, 500/64) = 8 = maxNlistExact: EXACT side
    val routed = SemDedup.semDedupAuto(e, tau = 0.4, maxNlistExact = 8)
      .collect().toSeq
    val fixedCentroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val exact = SemDedup.semDedup(e, fixedCentroids, tau = 0.4).collect().toSeq
    assert(routed == exact, "router must reproduce the exact leg bit-for-bit")
    // doubled corpus → nlist = 15 > 8: TRAINED side, same bit-for-bit law
    val big = e.select(col("vec_id"), col("embedding")).unionByName(
      e.select((col("vec_id") + 500L).as("vec_id"), col("embedding")))
    val routedBig = SemDedup.semDedupAuto(big, tau = 0.4, maxNlistExact = 8)
      .collect().toSeq
    val (supers, children) = Similarity.hierQuantizer(big, nlist = 15, iters = 2)
    val trained = SemDedup.screenAssigned(
      Similarity.hierAssign(big, supers, children), tau = 0.4).collect().toSeq
    assert(routedBig == trained,
      "router must reproduce the trained leg bit-for-bit")
  }
}
