package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSketchSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  /** Text whose 5-shingles are the sliding windows over `w1..wn`. */
  private def words(ids: Seq[Int]): String = ids.map(i => s"w$i").mkString(" ")

  test("exact mode: below-k sources report exact hash-distinct overlap") {
    // two sources, 16 and 20 shingles, 8 shared — far below K=128, so
    // theta = P and every estimate is exact (no hash collisions at this
    // size; the spec would fail loudly if the mixer ever collided here)
    val a = docsDf(Seq(
      (1L, words(0 until 20), "a"),    // 16 shingles, starts 0..15
      (2L, words(12 until 36), "b")))  // 20 shingles, starts 12..31
    val out = ThetaSketch.thetaOverlap(a).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 4L, s"est_common ${r.getLong(2)}")   // starts 12..15
    assert(r.getLong(3) == 32L, s"est_union ${r.getLong(3)}")   // 16 + 20 - 4
    assert(r.getLong(5) == 4L, s"exact_common ${r.getLong(5)}")
    assert(math.abs(r.getDouble(4) - 4.0 / 32.0) < 1e-3)
  }

  test("disjoint sources report zero overlap, nonzero union") {
    val a = docsDf(Seq(
      (1L, words(0 until 10), "a"),
      (2L, words(100 until 110), "b")))
    val r = ThetaSketch.thetaOverlap(a).collect().head
    assert(r.getLong(2) == 0L && r.getLong(5) == 0L)
    assert(r.getLong(3) == 12L) // 6 + 6 disjoint shingles
    assert(r.getDouble(4) == 0.0)
  }

  test("estimate mode: union/intersection within KMV error bounds on a " +
      "controlled 3000-element overlap") {
    // sources with 2000 shingles each, 1000 shared -> union 3000,
    // intersection 1000. K=128 => rsd ~ 1/sqrt(127) ~ 8.9%; assert 3x.
    val a = docsDf(Seq(
      (1L, words(0 until 2004), "a"),        // starts 0..1999
      (2L, words(1000 until 3004), "b")))    // starts 1000..2999
    val r = ThetaSketch.thetaOverlap(a).collect().head
    val (estC, estU, exact) = (r.getLong(2), r.getLong(3), r.getLong(5))
    info(s"est_common=$estC est_union=$estU exact_common=$exact")
    assert(exact == 1000L)
    assert(math.abs(estU - 3000.0) / 3000.0 <= 0.27, s"union est $estU")
    // intersection inherits union-sample noise; allow a wider band
    assert(math.abs(estC - 1000.0) / 1000.0 <= 0.40, s"common est $estC")
  }

  test("merge identity: k smallest of a union equals the pairwise merge " +
      "of per-source sketches") {
    // relabelling two sources to one merged source must produce exactly
    // the k-smallest-of-union sketch — the property that makes KMV
    // sketches mergeable across partitions/shards with no error growth
    val two = docsDf(Seq(
      (1L, words(0 until 300), "a"),
      (2L, words(150 until 450), "b")))
    val one = docsDf(Seq(
      (1L, words(0 until 300), "m"),
      (2L, words(150 until 450), "m")))
    val sep = ThetaSketch.sourceSketches(two, ThetaSketch.K, 5)
      .select(explode(col("hs")).as("h")).collect().map(_.getLong(0)).toSet
    val merged = ThetaSketch.sourceSketches(one, ThetaSketch.K, 5)
      .select(explode(col("hs")).as("h")).collect().map(_.getLong(0)).toSeq
    // merged sketch = K smallest of the union of the two separate sketches
    val expect = sep.toSeq.sorted.take(ThetaSketch.K)
    assert(merged.sorted == expect)
  }

  test("q142 driver row is non-vacuous and estimates track exact overlap " +
      "on the real corpus") {
    val out = ThetaSketch.thetaOverlapQuery(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 190, s"20 sources -> 190 pairs, got ${out.length}")
    // aggregate calibration: summed estimates within 35% of summed exact
    // (per-pair estimates are noisy at K=128; the SUM has ~sqrt(190) less
    // relative noise and catches any systematic bias in the replayed math)
    val sumEst = out.map(_.getLong(2)).sum.toDouble
    val sumExact = out.map(_.getLong(5)).sum.toDouble
    info(s"sum est_common=$sumEst sum exact_common=$sumExact")
    assert(sumExact > 0)
    assert(math.abs(sumEst - sumExact) / sumExact <= 0.35,
      s"aggregate bias: est $sumEst vs exact $sumExact")
    // determinism: bit-identical on re-run
    val again = ThetaSketch.thetaOverlapQuery(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sketch-only mode (exactCheck=false) drops the exact twin but " +
    "preserves every estimate bit-for-bit") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val skOnly = ThetaSketch.thetaOverlap(docs, exactCheck = false)
    assert(skOnly.columns.toSeq ==
      Seq("source_a", "source_b", "est_common", "est_union", "est_jaccard"))
    val full = ThetaSketch.thetaOverlap(docs).drop("exact_common")
    assert(skOnly.collect().toSeq == full.collect().toSeq)
  }
}
