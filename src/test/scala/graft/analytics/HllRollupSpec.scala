package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rollup-by-merge contracts: the merge law (coarse registers from the
  * register table equal coarse registers from the facts), estimate
  * accuracy, and the no-rescan property is structural (mergeTo sees
  * only the register frame).
  */
class HllRollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("week registers merged from days equal week registers from the facts") {
    val ev = graft.Tables.events(spark, dir)
    // path 1: day registers from the facts, then a metadata-only merge
    val merged = HllRollup.mergeTo(HllRollup.dayRegisters(ev),
        date_format(date_trunc("week", col("day")), "yyyy-MM-dd"))
      .orderBy("period", "bucket").collect().map(_.toSeq)
    // path 2 (independent): registers built from the facts directly at
    // the week grain — truncating ts to the week start makes
    // dayRegisters key on the week-start date
    val direct = HllRollup.dayRegisters(
        ev.withColumn("ts", date_trunc("week", col("ts"))))
      .select(date_format(col("day"), "yyyy-MM-dd").as("period"),
        col("bucket"), col("reg"))
      .orderBy("period", "bucket").collect().map(_.toSeq)
    assert(merged.toSeq === direct.toSeq,
      "register-wise max over the day table must equal a direct week build")
  }

  test("estimates stay inside the 1024-register error envelope") {
    val out = HllRollup.weeklyRollupQuery(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Long]("est_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"rollup estimate off by more than 5%: $r")
    }
  }
}
