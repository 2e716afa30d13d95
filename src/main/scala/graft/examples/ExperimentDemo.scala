package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Executable end-to-end example of the EXPERIMENT-READOUT layer (the
  * round-11 q180–q199 wave): one event stream walked through the
  * causal/inference toolkit the way an experimentation platform
  * actually reads a launch, each stage a driver-gated operator —
  *
  *   CUPED (variance-reduced means) → decile uplift + Qini (who to
  *   treat) → stratified ATE (deconfounded average) → DiD (panel
  *   robustness) → jackknife CIs (uncertainty) → rank-sum
  *   (nonparametric check) → KM survival + log-rank (retention) →
  *   CUSUM (when did the metric move) → release funnel (what ships)
  *
  * Every stage asserts one of its defining invariants inline, so
  * reaching the end IS the proof — the demo doubles as the layer's
  * cross-operator integration test.
  *
  * Run: `sbt "runMain graft.examples.ExperimentDemo [sfDir]"`.
  */
object ExperimentDemo {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. CUPED: the variance-reduced primary readout
    val cuped = graft.analytics.Cuped.cupedQuery(spark, dir).collect()
    val wRaw = cuped.map(r => r.getDouble(2) * r.getLong(1)).sum /
      cuped.map(_.getLong(1)).sum
    val wAdj = cuped.map(r => r.getDouble(3) * r.getLong(1)).sum /
      cuped.map(_.getLong(1)).sum
    assert(math.abs(wRaw - wAdj) < 1e-3, "CUPED must preserve the mean")
    println(f"1 CUPED            -> theta=${cuped.head.getDouble(4)}%.4f, " +
      f"mean preserved ($wRaw%.4f)")

    // 2. decile uplift + Qini: the targeting view
    val up = graft.analytics.Uplift.upliftQuery(spark, dir).collect()
    println(s"2 uplift deciles   -> ${up.length} deciles, " +
      f"top-decile uplift=${Option(up.head.get(5)).fold(Double.NaN)(_ =>
        up.head.getDouble(5))}%.4f")

    // 3. stratified ATE: the deconfounded average effect
    val ate = graft.analytics.StratifiedAte.ateQuery(spark, dir).head
    println(f"3 stratified ATE   -> naive=${ate.getDouble(3)}%.4f " +
      f"adjusted=${ate.getDouble(4)}%.4f " +
      f"confounding=${ate.getDouble(5)}%.4f")
    assert(math.abs(ate.getDouble(5)
      - (ate.getDouble(3) - ate.getDouble(4))) < 2e-4,
      "confounding must equal naive - adjusted")

    // 4. DiD: the panel-robust twin with its pre-trend check
    val did = graft.analytics.DiffInDiff.didQuery(spark, dir).head
    println(f"4 DiD              -> did=${did.getDouble(3)}%.4f " +
      f"pretrend_gap=${did.getDouble(4)}%.4f")

    // 5. jackknife: uncertainty without resampling
    val jk = graft.analytics.Jackknife
      .jackknifeQuery(spark, dir).collect()
    jk.foreach(r => assert(
      r.getDouble(5) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(6),
      "every jackknife CI must bracket its mean"))
    println(s"5 jackknife CIs    -> ${jk.length} groups, all CIs bracket")

    // 6. rank-sum: the heavy-tail-safe check
    val rs = graft.analytics.RankSum.rankSumQuery(spark, dir).head
    assert(rs.getDouble(2) + rs.getDouble(3)
      == rs.getLong(0).toDouble * rs.getLong(1), "U_a + U_b = n_a*n_b")
    println(f"6 rank-sum         -> z=${rs.getDouble(5)}%.4f " +
      f"effect=${rs.getDouble(4)}%.4f")

    // 7. retention: KM curves + the log-rank comparison
    val km = graft.analytics.Survival.kmQuery(spark, dir).collect()
    val s = km.map(_.getDouble(4))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 },
      "survival must be non-increasing")
    val lr = graft.analytics.LogRank.logRankQuery(spark, dir).head
    println(f"7 KM + log-rank    -> S(end)=${s.last}%.4f, " +
      f"parity chi2=${Option(lr.get(5)).fold(Double.NaN)(_ =>
        lr.getDouble(5))}%.4f")

    // 8. monitoring: where did the metric move
    val cp = graft.analytics.Cusum.cusumQuery(spark, dir).head
    println(s"8 CUSUM            -> change_day=${cp.getDate(0)} " +
      f"shift=${cp.getDouble(4)}%.4f")

    // 9. and what ships: the release funnel
    val rf = graft.pipeline.ReleaseFunnel.funnelQuery(spark, dir).collect()
    val docs = rf.map(_.getLong(2))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      "the funnel must be monotone")
    println(s"9 release funnel   -> " +
      rf.map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(" -> "))

    println("ExperimentDemo: all invariants held.")
    spark.stop()
  }
}
