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

  test("sliding windows: merged window registers equal a direct build " +
    "from each 7-day fact slice, and exact twins match brute force") {
    val ev = graft.Tables.events(spark, dir)
    val got = HllRollup.slidingDistinctQuery(spark, dir).collect()
    assert(got.nonEmpty)
    // brute-force the exact twin per window from the fact table
    val pairs = ev.filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = pairs.map(_._1).distinct
    for (row <- got) {
      val end = row.getDate(0).toLocalDate
      val exact = pairs.filter { case (d, _) =>
        !d.isAfter(end) && !d.isBefore(end.minusDays(6)) }
        .map(_._2).distinct.length.toLong
      assert(row.getAs[Long]("exact_users") == exact, s"window $end")
      // estimate for 32 users with 1024 registers is exact in practice;
      // allow the envelope anyway
      val est = row.getAs[Long]("est_users")
      assert(math.abs(est - exact).toDouble / exact <= 0.15,
        s"window $end: est $est vs exact $exact")
    }
    assert(got.length == days.length, "one window per event day")
    // merge law on one middle window: registers merged from the day
    // table equal registers built directly from that window's facts
    val end = days.sorted.apply(days.length / 2)
    val slice = ev.filter(to_date(col("ts")) <= lit(end.toString).cast("date")
      && to_date(col("ts")) >= date_sub(lit(end.toString).cast("date"), 6))
    val direct = HllRollup.dayRegisters(
        slice.withColumn("ts", lit(end.toString).cast("timestamp")))
      .select(col("bucket"), col("reg")).orderBy("bucket")
      .collect().map(_.toSeq)
    val merged = HllRollup.mergeTo(
        HllRollup.dayRegisters(ev)
          .filter(col("day") <= lit(end.toString).cast("date")
            && col("day") >= date_sub(lit(end.toString).cast("date"), 6)),
        lit("w")).select(col("bucket"), col("reg")).orderBy("bucket")
      .collect().map(_.toSeq)
    assert(merged.toSeq === direct.toSeq)
  }
}
