package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Stream-stream attribution join on the real streaming path: matches
  * inside the horizon, rejects outside it, and drops late rows once the
  * watermark has expired the matching state.
  */
class StreamJoinSpec extends SparkSpec {
  import StreamJoins.{Click, Impression}
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("attribution join: horizon bound + watermark state expiry") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoins.attribution(imps.toDF(), clicks.toDF(), "10 minutes")
    val query = joined.writeStream
      .format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        Impression(1L, 100L, ts("2024-01-01 10:00:00")),
        Impression(2L, 200L, ts("2024-01-01 10:00:00")))
      clicks.addData(Click(11L, 100L, ts("2024-01-01 10:05:00"))) // in horizon
      query.processAllAvailable()
      val first = spark.table("attr_out").collect()
      assert(first.length == 1)
      assert(first.head.getAs[Long]("imp_id") == 1L
        && first.head.getAs[Long]("click_id") == 11L)

      // 20 minutes after the impression → outside the 10-minute horizon
      clicks.addData(Click(12L, 200L, ts("2024-01-01 10:20:00")))
      query.processAllAvailable()
      assert(spark.table("attr_out").count() == 1)

      // the GLOBAL watermark is the min across both input streams — both
      // must advance to ~11:00 before 10:00-era state can expire
      clicks.addData(Click(13L, 300L, ts("2024-01-01 11:00:00")))
      imps.addData(Impression(3L, 999L, ts("2024-01-01 11:00:00")))
      query.processAllAvailable()
      // a late click that WOULD have matched arrives behind the watermark
      clicks.addData(Click(14L, 100L, ts("2024-01-01 10:06:00")))
      query.processAllAvailable()
      assert(spark.table("attr_out").count() == 1) // dropped, state expired
    } finally query.stop()
  }
}
