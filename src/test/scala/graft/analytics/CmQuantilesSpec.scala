package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dyadic CM quantile guarantees: exactness when the sketch is
  * collision-free, the one-sided early-stop bias (est ≤ exact — CM only
  * OVERestimates, so the descent can only branch left early), the
  * descent-path rank-error bound, build mergeability, and domain
  * saturation.
  */
class CmQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("collision-free sketch recovers exact lower quantiles") {
    // 100 distinct cent values, one row each — far below w=1024, so no
    // same-row collisions at level 0 and the descent is exact arithmetic
    val rows = (1 to 100)
      .map(i => ("g", i / 100.0)).toDF("grp", "value")
    val out = CmQuantiles.quantiles(rows, Seq(0.5, 0.9, 0.99))
      .orderBy("p").collect()
    // target rank ceil(p*100) -> the target-th smallest cent value
    assert(out.map(_.getAs[Long]("est_cents")).toSeq === Seq(50L, 90L, 99L))
    assert(out.map(_.getAs[Long]("target_rank")).toSeq === Seq(50L, 90L, 99L))
    assert(out.map(_.getAs[Double]("est_value")).toSeq === Seq(0.5, 0.9, 0.99))
  }

  test("estimates never exceed the exact quantile, and rank error is bounded") {
    val events = graft.Tables.events(spark, dir)
      .select(col("event_type").as("grp"), col("value"))
    val out = CmQuantiles.quantiles(events, Seq(0.5, 0.9, 0.99))
      .collect()
    val exact = events.filter(col("value").isNotNull)
      .select(col("grp"), (round(col("value") * 100)).cast("long").as("v"))
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted }
    // CM overestimates counts, so the dyadic descent can only stop early:
    // est_cents <= exact lower quantile, deterministically. The rank gap
    // is at most the sum of the <=L overestimates met on the descent path
    // (each <= eps*n w.h.p., eps = e/w) — assert the L*eps*n envelope.
    out.foreach { r =>
      val vs = exact(r.getAs[String]("grp"))
      val target = r.getAs[Long]("target_rank").toInt
      val est = r.getAs[Long]("est_cents")
      val exactQ = vs(target - 1)
      assert(est <= exactQ, s"descent overshot the exact quantile: $r")
      // rank actually attained by the estimate (values <= est)
      val attained = vs.count(_ <= est)
      val bound = math.ceil(
        CmQuantiles.Levels * math.E / CountMin.W * vs.length).toLong
      assert(target - attained <= bound,
        s"rank shortfall ${target - attained} above L*eps*n=$bound: $r")
    }
  }

  test("sketch of a union equals cell-wise sum of per-part sketches (mergeable)") {
    val a = Seq(("g", 1.07), ("g", 2.53), ("h", 9.99)).toDF("grp", "value")
    val b = Seq(("g", 1.07), ("h", 0.42)).toDF("grp", "value")
    val whole = CmQuantiles.sketch(a.unionByName(b))
      .orderBy("grp", "level", "r", "bucket").collect().toSeq
    val merged = CmQuantiles.sketch(a).unionByName(CmQuantiles.sketch(b))
      .groupBy(col("grp"), col("level"), col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .orderBy("grp", "level", "r", "bucket").collect().toSeq
    assert(whole.map(_.toSeq) === merged.map(_.toSeq))
  }

  test("values outside the domain saturate instead of corrupting the tree") {
    val rows = Seq(("g", -5.0), ("g", 1e9), ("g", 1.00)).toDF("grp", "value")
    val out = CmQuantiles.quantiles(rows, Seq(0.5)).collect()
    // ranks: -5.0 -> 0 cents, 1.00 -> 100, 1e9 -> Domain-1; median = 100
    assert(out.length === 1)
    assert(out.head.getAs[Long]("est_cents") === 100L)
    // and the saturated extremes are still findable at the edges
    val hi = CmQuantiles.quantiles(rows, Seq(0.99)).collect().head
    assert(hi.getAs[Long]("est_cents") === CmQuantiles.Domain - 1L)
  }
}
