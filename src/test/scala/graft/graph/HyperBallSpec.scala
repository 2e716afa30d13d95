package graft.graph

import graft.SparkSpec

/** HyperBall contracts on hand graphs: the exact column is the known
  * reachable-pair count, the estimate tracks it in the linear-counting
  * regime, registers only grow (monotone in h), and propagation reaches
  * a fixed point at the component diameter.
  */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def bidir(pairs: (Long, Long)*) =
    pairs.toDF("u", "v").select(col("u"), col("v"))
      .unionByName(pairs.toDF("u", "v").select(col("v").as("u"), col("u").as("v")))

  test("path graph 1-2-3-4-5: exact pair counts per hop are the " +
    "textbook sequence and the estimate stays within sketch error") {
    val out = HyperBall.neighborhood(bidir(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
        hops = 3, exactCheck = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // |{(a,b): d<=h}|: h=0: 5 diag; each hop adds 2 per new pair
    assert(out(0L)._2 === 5L)
    assert(out(1L)._2 === 13L)
    assert(out(2L)._2 === 19L)
    assert(out(3L)._2 === 23L)
    // m=64 linear counting on <=5-element balls: within 1 per vertex
    (0L to 3L).foreach { h =>
      assert(math.abs(out(h)._1 - out(h)._2) <= 5L,
        s"h=$h est ${out(h)._1} vs exact ${out(h)._2}")
    }
  }

  test("estimates are monotone in h (registers only grow)") {
    val out = HyperBall.neighborhood(
        bidir(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L),
        hops = 3, exactCheck = false)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    assert(out.zip(out.tail).forall { case (a, b) => a <= b })
  }

  test("fixed point at the diameter: one extra round on a triangle " +
    "changes nothing") {
    val e = bidir(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val r1 = HyperBall.propagate(
      HyperBall.vertexRegisters(e.select(col("u").as("v")).distinct()), e)
    val r2 = HyperBall.propagate(r1, e)
    assert(r2.except(r1).count() === 0L && r1.except(r2).count() === 0L)
  }

  test("exactCheck=false plans no pair-scale object and keeps the " +
    "estimate column identical") {
    val e = bidir(1L -> 2L, 2L -> 3L)
    val withEx = HyperBall.neighborhood(e, 2, exactCheck = true)
      .select("h", "est_reach").collect().map(_.toSeq).toSet
    val noEx = HyperBall.neighborhood(e, 2, exactCheck = false)
    assert(noEx.columns.toSeq === Seq("h", "est_reach"))
    assert(noEx.collect().map(_.toSeq).toSet === withEx)
  }

  test("systolic rounds are bit-identical to dense propagate " +
    "(max is idempotent; unchanged cells were already absorbed)") {
    val e = bidir(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 10L -> 11L)
    var dense = HyperBall.vertexRegisters(
      e.select(col("u").as("v")).distinct())
    var regs = dense
    var delta = dense
    (1 to 4).foreach { _ => // 4 = the path component's diameter
      dense = HyperBall.propagate(dense, e)
      val merged = HyperBall.systolicRound(regs, delta, e)
      regs = HyperBall.roundRegs(merged)
      delta = HyperBall.roundDelta(merged)
      assert(regs.except(dense).count() === 0L
        && dense.except(regs).count() === 0L)
    }
    // past the diameter the frontier is empty — the systolic win
    assert(HyperBall.roundDelta(
      HyperBall.systolicRound(regs, delta, e)).count() === 0L)
  }

  test("probed twin: probes covering the whole graph reproduce the " +
    "full exact column, and est_reach matches the dense estimate") {
    val e = bidir(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val full = HyperBall.neighborhood(e, 2, exactCheck = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val probed = HyperBall.neighborhoodProbed(e, 2, nProbes = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    (0L to 2L).foreach { h =>
      assert(probed(h)._1 === full(h)._1)       // est_reach identical
      assert(probed(h)._2 === full(h)._1)       // probes ⊇ V ⇒ probe_est = est
      assert(probed(h)._3 === full(h)._2)       // probe_exact = exact
    }
  }

  test("probed twin on a probe subset: probe_exact counts only " +
    "probe-rooted pairs") {
    // path 1-2-3-4: probes {1,2} → h=1 pairs from 1: {1,2}, from 2: {1,2,3}
    val e = bidir(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val out = HyperBall.neighborhoodProbed(e, 1, nProbes = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) === 2L)
    assert(out(1L) === 5L)
  }

  test("q177 on testdata: probe-exact reach is monotone and the " +
    "probe-scoped estimate err stays inside the m=64 band") {
    val out = HyperBall.hllReachQuery(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 4)
    val exact = out.map(_.getLong(3))
    assert(exact.zip(exact.tail).forall { case (a, b) => a <= b })
    assert(exact.head > 0L)
    out.foreach { r =>
      val err = math.abs(r.getDouble(4))
      assert(err < 25.0, s"h=${r.getLong(0)} err_pct $err")
    }
  }
}
