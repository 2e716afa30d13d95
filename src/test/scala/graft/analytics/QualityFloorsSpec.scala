package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Numeric quality floors for the approximate operators that the DuckDB
  * oracle cannot reach (xxhash64-seeded / sketch semantics): each is
  * cross-validated against its exact counterpart on the real sf0.001
  * testdata, so a regression in recall/precision/error fails CI even
  * though the row-level results are seed-dependent.
  */
class QualityFloorsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  def topkPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q29/q37 ANN planted-neighbor recall floors") {
    // The testdata embeddings are near-orthogonal random vectors — the
    // regime where ANN recall against an arbitrary exact top-k is
    // meaningless (the "top" neighbors are barely above noise, and a sign
    // sketch agrees with a ~90° neighbor on all 8 bits w.p. ~2^-8). The
    // guarantee ANN actually makes is: vectors that ARE near get found.
    // Plant 20 noisy copies (cos ≈ 0.95, θ ≈ 18°) and require the base
    // vector in the query's top-5.
    val emb = graft.Tables.embeddings(spark, dir)
    val planted = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) + lit(0.45)
            * sin(i.cast("double") * 1.7 + col("vec_id")))).cast("float"))
          .as("embedding"))
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").union(planted)
    val isQuery = col("vec_id") >= 10000L
    def plantedRecall(df: DataFrame): Double = {
      val hits = topkPairs(df)
      (0 until 20).count(i => hits((i + 10000L, i.toLong))) / 20.0
    }
    val lshR = plantedRecall(Similarity.lshCosineTopK(corpus, isQuery, k = 5))
    val ivfR = plantedRecall(Similarity.ivfCosineTopK(corpus, isQuery, k = 5))
    info(s"LSH planted recall = $lshR, IVF planted recall = $ivfR")
    assert(lshR >= 0.6, s"LSH planted recall@5 = $lshR")
    assert(ivfR >= 0.6, s"IVF planted recall@5 = $ivfR")
    // the trained quantizer (the q37 gate configuration) must not lose
    // recall vs the hash-ordered init — better centroids concentrate true
    // neighbors into the probed lists
    val ivfTrainedR = plantedRecall(
      Similarity.ivfCosineTopK(corpus, isQuery, k = 5, trainIters = 2))
    info(s"IVF planted recall trained = $ivfTrainedR (untrained $ivfR)")
    assert(ivfTrainedR >= ivfR,
      s"training lost recall: $ivfR -> $ivfTrainedR")
    // probe-distance monotonicity: more probing never loses recall
    val singleR = plantedRecall(
      Similarity.lshCosineTopK(corpus, isQuery, k = 5, multiProbe = 0))
    val twoR = plantedRecall(
      Similarity.lshCosineTopK(corpus, isQuery, k = 5, multiProbe = 2))
    info(s"LSH recall by probe distance: d0=$singleR d1=$lshR d2=$twoR")
    assert(lshR >= singleR && twoR >= lshR)
  }

  test("k-means refinement improves the IVF quantizer objective") {
    val emb = graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val init = Similarity.ivfCentroids(emb, nlist = 16)
    val refined = Similarity.kmeansCentroids(emb, nlist = 16, iters = 3)
    val before = Similarity.quantizerObjective(emb, init)
    val after = Similarity.quantizerObjective(emb, refined)
    info(f"objective: init=$before%.4f refined=$after%.4f")
    assert(after > before, s"refinement did not improve: $before -> $after")
    // deterministic: a re-run lands on identical centroids
    val again = Similarity.kmeansCentroids(emb, nlist = 16, iters = 3)
    assert(refined.collect().map(_.toString).sorted
      sameElements again.collect().map(_.toString).sorted)
  }

  test("power-iteration PCA recovers a planted dominant direction") {
    import spark.implicits._
    // x_i = a_i·u + ε: amplitudes ±[1, 3] along a fixed unit axis u, plus
    // deterministic small noise. The recovered component must align with
    // u (|cos| ≥ 0.98) — and on re-run, identically (no RNG anywhere).
    val d = 16
    val u = Array.tabulate(d)(j => math.sin(j * 0.9 + 0.3))
    val un = { val n = math.sqrt(u.map(a => a * a).sum); u.map(_ / n) }
    val rows = (0 until 400).map { i =>
      val a = (1.0 + (i % 20) / 10.0) * (if (i % 2 == 0) 1 else -1)
      (i.toLong, Array.tabulate(d)(j =>
        (a * un(j) + 0.05 * math.sin(i * 1.7 + j * 2.3)).toFloat))
    }.toDF("vec_id", "embedding")
    val pc = Similarity.topPrincipalComponent(rows)
    val cos = pc.zip(un).map { case (a, b) => a * b }.sum
    info(f"planted-axis alignment |cos| = ${math.abs(cos)}%.4f")
    assert(math.abs(cos) >= 0.98, s"recovered direction misaligned: $cos")
    val again = Similarity.topPrincipalComponent(rows)
    assert(pc.sameElements(again))
  }

  test("q27 MinHash-LSH precision/recall vs q25 exact Jaccard") {
    val docs = graft.Tables.documents(spark, dir)
    // exact Jaccard at the MinHash estimate's own firing threshold (0.5),
    // uncapped so the reference set is the full truth
    val exact = Dedup.jaccardPairs(docs, k = 5, threshold = 0.5,
      maxDf = Int.MaxValue).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashLshPairs(docs).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && mh.nonEmpty)
    val precision = mh.intersect(exact).size.toDouble / mh.size
    val recall = mh.intersect(exact).size.toDouble / exact.size
    assert(precision >= 0.8, s"MinHash precision = $precision (${mh.size} pairs)")
    assert(recall >= 0.8, s"MinHash recall = $recall (${exact.size} true pairs)")
    spark.catalog.clearCache()
  }

  test("native session_window ≡ the q45 lag-cumsum sessionization") {
    // two independent formulations of the same 30-minute-gap semantics:
    // Spark's Catalyst session_window operator vs the composed window
    // chain behind q45 — per-user session (start, end, n) sets must match
    val e = graft.Tables.events(spark, dir)
    val native = e.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val composed = CoreQueries.eventSessions(spark, dir)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == composed)
  }

  test("freqItems sketch covers the exact top tokens") {
    // the one-pass frequent-items sketch must contain every token the
    // exact count ranks in the top 10 (support 1% ⇒ guaranteed superset
    // of anything above that frequency)
    val toks = graft.Tables.documents(spark, dir)
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
    val exactTop = toks.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok")).limit(10)
      .collect().map(_.getString(0)).toSet
    val sketch = toks.stat.freqItems(Seq("tok"), 0.01)
      .collect()(0).getSeq[String](0).toSet
    assert(exactTop.subsetOf(sketch),
      s"missing: ${exactTop.diff(sketch)}")
  }

  test("percentile_approx within 2% of the exact interpolated percentile") {
    // the 100 TB percentile path (single-pass sketch) vs q35's exact
    // sort-based percentile — relative error floor at default accuracy
    val e = graft.Tables.events(spark, dir)
    val rows = e.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.9)").as("exact"),
      expr("percentile_approx(value, 0.9)").as("approx")).collect()
    rows.foreach { r =>
      val (ex, ap) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ap - ex) / math.abs(ex) <= 0.02,
        s"${r.getString(0)}: exact=$ex approx=$ap")
    }
  }

  test("q31 HLL approx distinct within 5% of q15 exact counts") {
    val exact = CoreQueries.distinctStats(spark, dir).collect().head
    val approx = CoreQueries.approxDistinctStats(spark, dir).collect().head
    Seq(0, 1, 2).foreach { i =>
      val (e, a) = (exact.getLong(i), approx.getLong(i))
      val relErr = math.abs(a - e).toDouble / e
      assert(relErr <= 0.05, s"col $i: exact=$e approx=$a relErr=$relErr")
    }
  }
}
