package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Proves the windowed aggregation actually runs in STREAMING mode with
  * watermark semantics — append output only emits a window once the
  * watermark passes its end, and late data beyond the watermark is dropped.
  * (WindowedAggsSpec covers the batch path; this is the readStream path.)
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("append-mode tumbling window: emits on watermark pass, drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[WindowedAggs.Event]
    val windowed = WindowedAggs.tumbling(
      source.toDF(), windowLen = "1 hour", lateness = "30 minutes")
    val query = windowed.writeStream
      .format("memory")
      .queryName("win_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two events in the 10:00 window
      source.addData(
        WindowedAggs.Event(1L, ts("2024-01-01 10:05:00"), "click", 1.0),
        WindowedAggs.Event(1L, ts("2024-01-01 10:40:00"), "click", 2.0))
      query.processAllAvailable()
      // watermark = max(10:40) - 30min = 10:10 < 11:00 → nothing final yet
      assert(spark.table("win_out").count() == 0)

      // batch 2: event at 12:00 pushes watermark to 11:30 → 10:00 window closes
      source.addData(WindowedAggs.Event(2L, ts("2024-01-01 12:00:00"), "click", 5.0))
      query.processAllAvailable()
      val closed = spark.table("win_out").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("n_events") == 2L)
      assert(closed.head.getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))

      // batch 3: a LATE event for the already-closed 10:00 window is dropped
      source.addData(WindowedAggs.Event(3L, ts("2024-01-01 10:50:00"), "click", 9.0))
      query.processAllAvailable()
      assert(spark.table("win_out").count() == 1) // unchanged — late row ignored
    } finally query.stop()
  }
}
