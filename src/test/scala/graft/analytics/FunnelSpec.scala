package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The funnel's ordering contract: stages only count when they happen at
  * or after the previous stage's anchor — a click BEFORE the first view
  * is not a conversion, which is exactly what a per-type EXISTS would get
  * wrong.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int) = new java.sql.Timestamp(m * 60000L)

  test("out-of-order stages do not convert; in-order ones do") {
    // user 1: view(1) → click(2) → purchase(3): full funnel
    // user 2: click(1) → view(2): click precedes first view → no stage 2
    // user 3: view(1) → purchase(2): no click → purchase can't anchor
    // user 4: view(1) → click(2) → purchase at SAME minute as click (≥ ⇒ counts)
    val rows = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "click", ts(1)), (2L, "view", ts(2)),
      (3L, "view", ts(1)), (3L, "purchase", ts(2)),
      (4L, "view", ts(1)), (4L, "click", ts(2)), (4L, "purchase", ts(2)))
      .toDF("user_id", "event_type", "ts")
    // route through the real query path: write a parquet events table the
    // same way Tables.events reads it (micros-as-nanos long column)
    val dir = Files.createTempDirectory("graft-funnel").toString
    rows.select(col("user_id"), col("event_type"),
        (unix_micros(col("ts")) * 1000L).as("ts"),
        lit(0.0).as("value"), lit("e").as("event_id2"))
      .withColumnRenamed("event_id2", "props")
      .withColumn("event_id", col("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = CoreQueries.funnel(spark, dir).collect().head
    assert(out.getLong(0) == 4L) // all four users viewed
    assert(out.getLong(1) == 2L) // users 1 and 4 clicked after viewing
    assert(out.getLong(2) == 2L) // users 1 and 4 completed (ts ≥ anchor)
  }
}
