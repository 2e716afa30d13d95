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

  test("q59 batch twin ≡ streaming attribution on the same real events") {
    // the property that makes q59's DuckDB oracle meaningful for the
    // STREAMING operator: the same events through MemoryStream produce
    // exactly the batch result (single in-order batch — nothing is late,
    // so watermarking must not drop anything)
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type").collect()
    val imps = ev.filter(_.getString(3) == "view")
      .map(r => Impression(r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val clicks = ev.filter(_.getString(3) == "click")
      .map(r => Click(r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val impStream = MemoryStream[Impression]
    val clickStream = MemoryStream[Click]
    val joined = StreamJoins.attribution(
      impStream.toDF(), clickStream.toDF(), "1 hour")
    val query = joined.writeStream
      .format("memory").queryName("attr_twin")
      .outputMode(OutputMode.Append()).start()
    try {
      impStream.addData(imps.toSeq)
      clickStream.addData(clicks.toSeq)
      query.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("imp_id"), r.getAs[Long]("click_id"),
          r.getAs[Timestamp]("imp_ts").getTime,
          r.getAs[Timestamp]("click_ts").getTime)
      val streamed = spark.table("attr_twin").collect().map(key).toSet
      val batch = StreamJoins.attributionQuery(spark, dir).collect().map(key).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"stream-only: ${streamed.diff(batch)}; batch-only: ${batch.diff(streamed)}")
    } finally query.stop()
  }

  test("outer attribution: null rows emit only after the watermark closes the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val joined = StreamJoins.attributionOuter(
      imps.toDF(), clicks.toDF(), "10 minutes")
    val query = joined.writeStream
      .format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        Impression(1L, 100L, ts("2024-01-01 10:00:00")), // converts
        Impression(2L, 200L, ts("2024-01-01 10:00:00"))) // never converts
      clicks.addData(Click(11L, 100L, ts("2024-01-01 10:05:00")))
      query.processAllAvailable()
      // the match emits promptly; imp 2's null row must NOT exist yet —
      // its horizon (10:10) is still ahead of the watermark, a click
      // could still arrive
      val first = spark.table("attr_outer").collect()
      assert(first.length == 1 && first.head.getAs[Long]("imp_id") == 1L)
      // advance BOTH streams to 11:00 (wm 10:50 > 10:10), then nudge a
      // second batch to 12:00 — outer-state eviction runs a batch behind
      // the watermark update, and the nudge also closes imp 3's horizon
      imps.addData(Impression(3L, 300L, ts("2024-01-01 11:00:00")))
      clicks.addData(Click(12L, 998L, ts("2024-01-01 11:00:00")))
      query.processAllAvailable()
      imps.addData(Impression(4L, 400L, ts("2024-01-01 12:00:00")))
      clicks.addData(Click(13L, 997L, ts("2024-01-01 12:00:00")))
      query.processAllAvailable()
      val rows = spark.table("attr_outer").collect()
      val nulls = rows.filter(r => r.isNullAt(r.fieldIndex("click_id")))
        .map(_.getAs[Long]("imp_id")).toSet
      assert(nulls === Set(2L, 3L),
        s"expected expiry-emitted nulls for imps 2 and 3, got $nulls")
      // imp 4's horizon is still open; the matched imp 1 never gets a
      // null sibling
      assert(rows.count(_.getAs[Long]("imp_id") == 1L) === 1)
      assert(!nulls.contains(4L))
    } finally query.stop()
  }

  test("streaming dedup: re-delivered ids dropped, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Click]
    val deduped = StreamJoins.dedupStream(src.toDF(), "click_id", "click_ts",
      lateness = "10 minutes")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      src.addData(
        Click(1L, 100L, ts("2024-01-01 10:00:00")),
        Click(1L, 100L, ts("2024-01-01 10:00:30")), // same id re-delivered
        Click(2L, 100L, ts("2024-01-01 10:01:00")))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // a later batch re-sending id 1 within the watermark window: dropped
      src.addData(Click(1L, 100L, ts("2024-01-01 10:02:00")))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // far future event advances the watermark; id 2's state can expire,
      // and genuinely new ids still pass
      src.addData(Click(3L, 100L, ts("2024-01-01 12:00:00")))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
    } finally query.stop()
  }
}
