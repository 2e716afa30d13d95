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
}
