package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Uplift/Qini contracts: a hand-traced two-decile readout, the decile
  * cut's tie and conservation laws, and a planted-uplift recovery.
  */
class UpliftSpec extends SparkSpec {

  private def units(rows: (Long, Long, Boolean, Boolean)*) = {
    import spark.implicits._
    rows.toDF("unit_id", "score", "treated", "converted")
  }

  test("hand-traced: 20 units, two score tiers, planted top-tier uplift") {
    // top tier (score 9): treated convert 4/5, control 1/5;
    // bottom tier (score 1): both convert 1/5.
    val rows = (0 until 20).map { i =>
      val top = i < 10
      val treated = i % 2 == 0
      val converted =
        if (top) (if (treated) i / 2 < 4 else i % 10 == 1)
        else (if (treated) i == 10 else i == 11)
      (i.toLong, if (top) 9L else 1L, treated, converted)
    }
    val out = Uplift.qiniDeciles(units(rows: _*)).collect()
    // two distinct scores, 10 units each -> deciles 5 and 10 only
    assert(out.map(_.getLong(0)).toSeq === Seq(5L, 10L))
    val top = out(0)
    assert(top.getLong(1) === 5L && top.getLong(2) === 5L)
    assert(math.abs(top.getDouble(5) - (0.8 - 0.2)) < 1e-9)
    // qini at the top cut: 4 - 1 * (5/5) = 3
    assert(math.abs(top.getDouble(6) - 3.0) < 1e-9)
  }

  test("score ties share a decile: one score value never splits") {
    val rows = (0 until 30).map(i =>
      (i.toLong, (i % 3).toLong, i % 2 == 0, false))
    val cells = Uplift.qiniDeciles(units(rows: _*)).collect()
    // 3 score values, 10 units each -> at most 3 decile rows
    assert(cells.length <= 3)
    assert(cells.map(r => r.getLong(1) + r.getLong(2)).sum === 30L)
  }

  test("q189 on testdata: units conserve, qini starts where uplift says") {
    val out = Uplift.upliftQuery(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val total = out.map(r => r.getLong(1) + r.getLong(2)).sum
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull).select("user_id").distinct().count()
    assert(total === users)
    // first decile's qini = n_t * uplift exactly (algebra:
    // conv_t - conv_c*n_t/n_c = n_t*(conv_t/n_t - conv_c/n_c)),
    // up to the two columns' rounding grains; cells with an empty arm
    // surface as NULL (never a division error) and are skipped
    val f = out.head
    if (!f.isNullAt(5) && !f.isNullAt(6)) {
      val tol = math.max(1e-3, f.getLong(1) * 2e-6)
      assert(math.abs(f.getDouble(6) - f.getDouble(5) * f.getLong(1)) < tol)
    }
    out.foreach { r =>
      if (r.isNullAt(3)) assert(r.getLong(1) === 0L)
      if (r.isNullAt(4)) assert(r.getLong(2) === 0L)
    }
  }
}
