package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillLocf: fills forward, leading gaps stay null, flags mark fills") {
    val daily = Seq(
      ("a", "2024-01-01", 10.0),
      ("a", "2024-01-04", 40.0),
      ("b", "2024-01-03", 30.0)
    ).toDF("g", "day", "v").withColumn("day", to_date(col("day")))
    val out = TimeSeries.gapFillLocf(daily, "g", "day", "v")
      .orderBy("g", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(out.length == 8) // global 4-day calendar × 2 groups
    assert(out.filter(_._1 == "a").map(x => (x._2, x._3, x._4)).toSeq == Seq(
      ("2024-01-01", Some(10.0), false),
      ("2024-01-02", Some(10.0), true),
      ("2024-01-03", Some(10.0), true),
      ("2024-01-04", Some(40.0), false)))
    assert(out.filter(_._1 == "b").map(x => (x._2, x._3, x._4)).toSeq == Seq(
      ("2024-01-01", None, true),
      ("2024-01-02", None, true),
      ("2024-01-03", Some(30.0), false),
      ("2024-01-04", Some(30.0), true)))
  }

  test("runHistory: same-value runs collapse, intervals chain, last is current") {
    val obs = Seq(
      (1L, "x", 1L, 1L), (1L, "x", 2L, 2L), (1L, "y", 3L, 3L), (1L, "x", 4L, 4L),
      (2L, "z", 1L, 5L)
    ).toDF("k", "v", "t", "id")
    val out = TimeSeries.runHistory(obs, "k", "v", "t", "id")
      .select("k", "run_id", "v", "valid_from", "valid_to", "n_events", "is_current")
      .orderBy("k", "run_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5), r.getBoolean(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, "x", 1L, Some(3L), 2L, false),
      (1L, 2L, "y", 3L, Some(4L), 1L, false),
      (1L, 3L, "x", 4L, None, 1L, true),
      (2L, 1L, "z", 1L, None, 1L, true)))
  }

  test("runHistory: timestamp ties break by the id column, not arrival order") {
    // two same-ts observations with different values: ids order them
    val obs = Seq((1L, "b", 5L, 2L), (1L, "a", 5L, 1L)).toDF("k", "v", "t", "id")
    val out = TimeSeries.runHistory(obs, "k", "v", "t", "id")
      .orderBy("run_id").select("run_id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("streaks: consecutive days form one island, gaps split, singletons count") {
    val days = Seq(
      ("u1", "2024-01-01"), ("u1", "2024-01-02"), ("u1", "2024-01-03"),
      ("u1", "2024-01-05"),                       // gap → new island
      ("u2", "2024-02-10")                        // lone day
    ).toDF("user_id", "day").withColumn("day", to_date(col("day")))
    val out = TimeSeries.streaks(days, "user_id", "day")
      .orderBy("user_id", "start_day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
    assert(out.toSeq == Seq(
      ("u1", 3L, "2024-01-01"), ("u1", 1L, "2024-01-05"),
      ("u2", 1L, "2024-02-10")))
  }

  test("streaks: month and year boundaries do not break a run") {
    val days = Seq(("u", "2023-12-31"), ("u", "2024-01-01"), ("u", "2024-01-02"))
      .toDF("user_id", "day").withColumn("day", to_date(col("day")))
    val out = TimeSeries.streaks(days, "user_id", "day").collect()
    assert(out.length == 1 && out(0).getLong(1) == 3L)
  }

  test("seasonalResiduals: flat series decomposes to zero residuals, no anomalies") {
    val daily = (0 until 21).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), 100L))
      .toDF("day", "n")
    val out = TimeSeries.seasonalResiduals(daily, "day", "n").collect()
    assert(out.length == 21)
    assert(out.forall(r => r.getDouble(4) == 0.0))       // resid
    assert(out.forall(r => !r.getBoolean(5)))            // is_anomaly
    assert(out.forall(r => r.getDouble(2) == 100.0))     // trend
  }

  test("seasonalResiduals: a one-day spike shows up in the residual") {
    val daily = (0 until 28).map { i =>
      val v = if (i == 14) 500L else 100L
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
    }.toDF("day", "n")
    val out = TimeSeries.seasonalResiduals(daily, "day", "n")
      .collect().map(r => r.getDate(0).toString -> r.getDouble(4)).toMap
    // the spike day's residual dominates every other day's
    val spike = out("2024-01-15")
    assert(out.filterNot(_._1 == "2024-01-15").values.forall(v =>
      math.abs(v) < math.abs(spike)))
  }

  test("streaksQuery ties: equal-length streaks pick the earliest start") {
    // build via streaks on a crafted frame mirroring the query's tail logic:
    // two 2-day islands for one user — the query must report the first
    val days = Seq(
      ("u", "2024-01-01"), ("u", "2024-01-02"),
      ("u", "2024-03-01"), ("u", "2024-03-02")
    ).toDF("user_id", "day").withColumn("day", to_date(col("day")))
    val st = TimeSeries.streaks(days, "user_id", "day")
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("len").desc, col("start_day"))
    val top = st.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1).collect()
    assert(top.length == 1 && top(0).getAs[java.sql.Date]("start_day")
      .toString == "2024-01-01")
  }
}
