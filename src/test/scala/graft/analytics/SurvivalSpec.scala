package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KM contracts: a hand-traced life table, the all-censored degenerate
  * curve, count conservation, and monotonicity on the testdata corpus.
  */
class SurvivalSpec extends SparkSpec {

  private def lifetimes(rows: (Long, Boolean)*) = {
    import spark.implicits._
    rows.toDF("duration_days", "churned")
  }

  test("hand-traced life table: risk sets, factors and the survival product") {
    // durations (1,churn) (2,churn) (2,censored) (3,censored):
    // S(1) = 3/4, S(2) = 3/4 * 2/3 = 1/2, S(3) = 1/2.
    val out = Survival.kaplanMeier(
      lifetimes((1L, true), (2L, true), (2L, false), (3L, false)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 1L, 1L, 0.5),
      (3L, 1L, 0L, 1L, 0.5)))
  }

  test("no churn events anywhere -> survival is identically 1") {
    val out = Survival.kaplanMeier(
      lifetimes((0L, false), (5L, false), (9L, false))).collect()
    assert(out.forall(_.getDouble(4) === 1.0))
  }

  test("testdata curve: non-increasing, in (0, 1], counts conserve") {
    val rows = Survival.kmQuery(spark, "/root/testdata/sf0.001").collect()
    val s = rows.map(_.getDouble(4))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(s.forall(x => x > 0.0 && x <= 1.0))
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull).select("user_id").distinct().count()
    // every user appears in exactly one (duration, outcome) cell
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === users)
  }

  test("censoring matters: treating censored users as churned understates " +
    "survival (the defect KM corrects)") {
    val lt = Survival.userLifetimes(
      graft.Tables.events(spark, "/root/testdata/sf0.001"), censorDays = 7)
    val km = Survival.kaplanMeier(lt)
      .orderBy(desc("duration_days")).select("survival").head.getDouble(0)
    val naive = Survival.kaplanMeier(lt.withColumn("churned", lit(true)))
      .orderBy(desc("duration_days")).select("survival").head.getDouble(0)
    assert(naive <= km)
  }
}
