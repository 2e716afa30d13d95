package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import Sessionize.{Ev, Sess}

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)
  private def us(min: Long): Long = min * 60L * 1000000L

  test("batch typed sessions cut on the 30-minute gap with 1-based ids") {
    val evs = Seq(
      Ev(1L, 1L, us(0)), Ev(1L, 2L, us(10)), Ev(1L, 3L, us(20)),
      Ev(1L, 4L, us(51)),                   // 31-min gap -> new session
      Ev(2L, 5L, us(5))).toDS()
    val out = Sessionize.sessions(evs).collect().toSet
    assert(out === Set(
      Sess(1L, 1L, 3L, us(0), us(20), 1200.0),
      Sess(1L, 2L, 1L, us(51), us(51), 0.0),
      Sess(2L, 1L, 1L, us(5), us(5), 0.0)))
  }

  test("exactly-30-minute gaps stay in one session (strict > cut)") {
    val evs = Seq(Ev(1L, 1L, us(0)), Ev(1L, 2L, us(30))).toDS()
    val out = Sessionize.sessions(evs).collect()
    assert(out.length === 1 && out.head.n_events === 2L)
  }

  test("streaming sessions emit only after the watermark passes the gap") {
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    def drain(): Unit = { q.processAllAvailable() }
    // batch 1: two events 10 min apart -> one open session, nothing
    // emitted (events start at minute 1: a t == initial-watermark row
    // would be dropped as late)
    input.addData((1L, 1L, ts(1)), (1L, 2L, ts(11)))
    drain()
    assert(spark.table("sess_out").count() === 0L,
      "open session must not emit before its gap horizon")
    // batch 2: an event 31 min past the open end closes session 1 for
    // user 1 on the DATA path; a user-2 event opens its own session
    input.addData((1L, 3L, ts(42)), (2L, 4L, ts(42)))
    drain()
    val afterClose = spark.table("sess_out").as[Sess].collect()
    assert(afterClose.map(s => (s.user_id, s.n_events, s.start_us, s.end_us)).toSet
      === Set((1L, 2L, us(1), us(11))))
    // two flush batches: the first advances the watermark past every gap
    // horizon, the second fires the event-time TIMEOUTS (timeouts run in
    // the batch after the watermark move)
    input.addData((3L, 5L, ts(1000)))
    drain()
    input.addData((3L, 6L, ts(1001)))
    drain()
    q.stop()
    val finals = spark.table("sess_out").as[Sess].collect()
      .map(s => (s.user_id, s.n_events, s.start_us, s.end_us)).toSet
    assert(finals.contains((1L, 1L, us(42), us(42))))
    assert(finals.contains((2L, 1L, us(42), us(42))))
  }

  test("streaming closed-session bounds agree with the batch cut") {
    // same event set through both paths; compare the sessions the stream
    // has CLOSED (all of them, thanks to the far-future flush event)
    val events = Seq(
      (1L, 1L, 1L), (1L, 2L, 10L), (1L, 3L, 45L), (2L, 4L, 7L),
      (1L, 5L, 50L), (2L, 6L, 90L))
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm)
      .writeStream.format("memory").queryName("sess_par")
      .outputMode("append").start()
    input.addData(events.map { case (u, id, m) => (u, id, ts(m)) }: _*)
    q.processAllAvailable()
    input.addData((99L, 99L, ts(100000)))
    q.processAllAvailable()
    input.addData((99L, 98L, ts(100001)))
    q.processAllAvailable()
    q.stop()
    // FULL-ROW parity including the 1-based session ordinal: the streaming
    // twin's output schema matches the batch q122 exactly
    val streamed = spark.table("sess_par").as[Sess].collect()
      .filter(_.user_id != 99L).toSet
    val batch = Sessionize.sessions(
        events.map { case (u, id, m) => Ev(u, id, us(m)) }.toDS())
      .collect().toSet
    assert(streamed === batch)
  }

  test("a straggler older than start-gap forms its own earlier session, ids chronological") {
    // watermark delay (2h) exceeds the distance so the straggler is
    // admitted; it must NOT stretch the open session backwards
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "2 hours")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm)
      .writeStream.format("memory").queryName("sess_straggle")
      .outputMode("append").start()
    input.addData((1L, 1L, ts(100)))
    q.processAllAvailable()
    input.addData((1L, 2L, ts(20))) // 80 min before the open start
    q.processAllAvailable()
    input.addData((9L, 9L, ts(100000)))
    q.processAllAvailable()
    input.addData((9L, 8L, ts(100001)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_straggle").as[Sess].collect()
      .filter(_.user_id == 1L).map(s => (s.session_id, s.n_events, s.start_us)).toSet
    assert(out === Set((1L, 1L, us(20)), (2L, 1L, us(100))))
  }

  test("session ordinals survive a query RESTART from the checkpoint") {
    // run 1 leaves an open session in state; run 2 is a NEW query instance
    // on the same checkpoint whose emitted sessions must continue the
    // per-user ordinal sequence — the cross-restart numbering the state
    // carries (next_sid rides the checkpointed state store)
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-sess-restart").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def iso(min: Long) = java.time.Instant.ofEpochMilli(min * 60000L).toString
    def ev(u: Long, id: Long, min: Long) =
      s"""{"user_id":$u,"event_id":$id,"ts":"${iso(min)}"}"""
    def writeFile(name: String, lines: String*): Unit =
      Files.writeString(Paths.get(in, name), lines.mkString("\n"))
    def runOnce(): Unit = {
      val ds = spark.readStream.schema(schema).json(in)
        .selectExpr("user_id as _1", "event_id as _2", "ts as _3")
        .withWatermark("_3", "0 seconds")
        .as[(Long, Long, Timestamp)]
      val q = Sessionize.streamingSessions(ds)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeFile("b1.json", ev(1L, 1L, 1), ev(1L, 2L, 11)) // open session
    runOnce() // query instance 1 stops with the session still open

    writeFile("b2.json", ev(1L, 3L, 50)) // 39-min gap: closes session 1
    runOnce() // NEW query instance, same checkpoint
    writeFile("b3.json", ev(9L, 9L, 100000)) // advance the watermark
    runOnce()
    writeFile("b4.json", ev(9L, 8L, 100001)) // fire the event-time timeouts
    runOnce()

    // user 1 RETURNS after their previous session closed via TIMEOUT: the
    // counter tombstone must hand out ordinal 3, not restart at 1
    writeFile("b5.json", ev(1L, 4L, 100100))
    runOnce()
    writeFile("b6.json", ev(9L, 7L, 300000))
    runOnce()
    writeFile("b7.json", ev(9L, 6L, 300001))
    runOnce()

    val sessions = spark.read.parquet(out).as[Sess].collect()
      .filter(_.user_id == 1L).sortBy(_.session_id)
    assert(sessions.map(s => (s.session_id, s.n_events, s.start_us, s.end_us))
      .toSeq === Seq((1L, 2L, us(1), us(11)), (2L, 1L, us(50), us(50)),
        (3L, 1L, us(100100), us(100100))),
      sessions.mkString("; "))
  }

  test("tombstone TTL expires the counter: state drops and ordinals restart") {
    // ttl = 60 min of event time past the close horizon; user 1 returns
    // AFTER expiry, so their ordinal restarts at 1 (the documented trade
    // for bounding state by active users instead of ever-seen users)
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm,
        tombstoneTtlUs = Some(60L * 60L * 1000000L))
      .writeStream.format("memory").queryName("sess_ttl")
      .outputMode("append").start()
    input.addData((1L, 1L, ts(1)))
    q.processAllAvailable()
    // advance watermark past the gap horizon, then fire the close timeout
    input.addData((9L, 9L, ts(200)))
    q.processAllAvailable()
    input.addData((9L, 8L, ts(201)))
    q.processAllAvailable()
    // advance past close + ttl (1+30+60 min), then fire the tombstone
    // expiry; the user-9 noise keeps its own session alive
    input.addData((9L, 7L, ts(500)))
    q.processAllAvailable()
    input.addData((9L, 6L, ts(501)))
    q.processAllAvailable()
    // user 1 returns AFTER tombstone expiry: new session numbered 1 again
    input.addData((1L, 2L, ts(600)))
    q.processAllAvailable()
    input.addData((9L, 5L, ts(1000)))
    q.processAllAvailable()
    input.addData((9L, 4L, ts(1001)))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sess_ttl").as[Sess].collect()
      .filter(_.user_id == 1L).sortBy(_.start_us)
    assert(u1.map(s => (s.session_id, s.start_us)).toSeq
      === Seq((1L, us(1)), (1L, us(600))), u1.mkString("; "))
  }

  test("q135 parity: streaming TTL ordinals equal the batch ttlOrdinals cut") {
    // ttl = 60 min => restart boundary at gap+ttl = 90 min. User 1:
    // [1,10] sid 1; @50 (gap 40) sid 2; @200 (gap 150 > 90) RESTART sid 1;
    // @260 (gap 60 <= 90) sid 2. Events fed one batch per session so the
    // arrival-cut path (open session, no tombstone) takes every boundary.
    val ttl = Some(60L * 60L * 1000000L)
    val events = Seq((1L, 1L, 1L), (1L, 2L, 10L), (1L, 3L, 50L),
      (1L, 4L, 200L), (1L, 5L, 260L))
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm, tombstoneTtlUs = ttl)
      .writeStream.format("memory").queryName("sess_ttl_par")
      .outputMode("append").start()
    input.addData((1L, 1L, ts(1)), (1L, 2L, ts(10)))
    q.processAllAvailable()
    input.addData((1L, 3L, ts(50)))
    q.processAllAvailable()
    input.addData((1L, 4L, ts(200)))
    q.processAllAvailable()
    input.addData((1L, 5L, ts(260)))
    q.processAllAvailable()
    input.addData((9L, 9L, ts(1000)))
    q.processAllAvailable()
    input.addData((9L, 8L, ts(1001)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_ttl_par").as[Sess].collect()
      .filter(_.user_id == 1L).toSet
    val batch = Sessionize.ttlOrdinals(
        Sessionize.sessions(
          events.map { case (u, id, m) => Ev(u, id, us(m)) }.toDS()).toDF(),
        ttl.get)
      .drop("restarted").as[Sess].collect().toSet
    assert(streamed === batch, s"streamed=$streamed batch=$batch")
    assert(batch.map(s => (s.session_id, s.start_us))
      === Set((1L, us(1)), (2L, us(50)), (1L, us(200)), (2L, us(260))))
  }

  test("TTL restart is event-time exact: a return before the watermark fires the expiry still restarts") {
    // tombstone forms at watermark-close (end=1min, expiry at 91min);
    // user 1 returns at 150min while the watermark is still at 51min —
    // the tombstone has NOT timed out, but 150-1 > 90 means the batch
    // cut restarts, so the arrival check must too
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm,
        tombstoneTtlUs = Some(60L * 60L * 1000000L))
      .writeStream.format("memory").queryName("sess_ttl_exact")
      .outputMode("append").start()
    input.addData((1L, 1L, ts(1)))
    q.processAllAvailable()
    input.addData((9L, 9L, ts(50)))
    q.processAllAvailable()
    input.addData((9L, 8L, ts(51))) // fires u1's close; tombstone end=1min
    q.processAllAvailable()
    input.addData((1L, 2L, ts(150))) // watermark 51 < expiry 91: arrival cut
    q.processAllAvailable()
    input.addData((9L, 7L, ts(1000)))
    q.processAllAvailable()
    input.addData((9L, 6L, ts(1001)))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sess_ttl_exact").as[Sess].collect()
      .filter(_.user_id == 1L).sortBy(_.start_us)
    assert(u1.map(s => (s.session_id, s.start_us)).toSeq
      === Seq((1L, us(1)), (1L, us(150))), u1.mkString("; "))
  }

  test("no TTL: the counter tombstone still continues ordinals (default unchanged)") {
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm)
      .writeStream.format("memory").queryName("sess_nottl")
      .outputMode("append").start()
    input.addData((1L, 1L, ts(1)))
    q.processAllAvailable()
    input.addData((9L, 9L, ts(200)))
    q.processAllAvailable()
    input.addData((9L, 8L, ts(201)))
    q.processAllAvailable()
    input.addData((1L, 2L, ts(600))) // returns long after the close
    q.processAllAvailable()
    input.addData((9L, 7L, ts(1000)))
    q.processAllAvailable()
    input.addData((9L, 6L, ts(1001)))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sess_nottl").as[Sess].collect()
      .filter(_.user_id == 1L).sortBy(_.start_us)
    assert(u1.map(s => (s.session_id, s.start_us)).toSeq
      === Seq((1L, us(1)), (2L, us(600))), u1.mkString("; "))
  }

  test("sessions MERGE-drain: restart + late data converge to the batch cut, one row per session") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-sess-merge").toString
    val in = s"$base/in"; val table = s"$base/table"
    Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def iso(min: Long) = java.time.Instant.ofEpochMilli(min * 60000L).toString
    def ev(u: Long, id: Long, min: Long) =
      s"""{"user_id":$u,"event_id":$id,"ts":"${iso(min)}"}"""
    def writeFile(name: String, lines: String*): Unit =
      Files.writeString(Paths.get(in, name), lines.mkString("\n"))
    def runOnce(ckpt: String): Option[String] = {
      val ds = spark.readStream.schema(schema).json(in)
        .selectExpr("user_id as _1", "event_id as _2", "ts as _3")
        .withWatermark("_3", "0 seconds")
        .as[(Long, Long, Timestamp)]
      Sessionize.drainSessionsMerge(ds, table, s"$base/$ckpt")
    }
    def u1Rows(path: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .selectExpr("user_id", "session_id", "n_events", "end_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 1L).sortBy(_._2).toSeq

    // run 1 (checkpoint A, restarted per file like the ordinal spec):
    // session 1 closes on the data path, session 2 via TIMEOUT with only
    // the minute-50 event — that row lands in the MERGE table
    writeFile("b1.json", ev(1L, 1L, 1), ev(1L, 2L, 11))
    runOnce("ckptA")
    writeFile("b2.json", ev(1L, 3L, 50))
    runOnce("ckptA")
    writeFile("b3.json", ev(9L, 9L, 100000))
    runOnce("ckptA")
    writeFile("b4.json", ev(9L, 8L, 100001))
    val afterA = runOnce("ckptA")
    assert(u1Rows(afterA.get) === Seq((1L, 1L, 2L, us(11)), (1L, 2L, 1L, us(50))))

    // late event inside session 2 arrives after checkpoint A's watermark
    // has passed it — a fresh query instance (checkpoint B) replays the
    // full input and RE-EMITS session 2 with the late event merged in;
    // the MERGE key (user, session) must converge to ONE corrected row,
    // where the append sink would now hold two conflicting session-2 rows
    writeFile("b5.json", ev(1L, 4L, 60))
    runOnce("ckptB")
    writeFile("b6.json", ev(9L, 7L, 300000))
    runOnce("ckptB")
    writeFile("b7.json", ev(9L, 6L, 300001))
    val afterB = runOnce("ckptB")
    assert(afterB.isDefined)
    val got = u1Rows(afterB.get)
    // batch-cut ground truth over ALL user-1 events (1, 11, 50, 60)
    val expected = Sessionize.sessions(
        Seq(Ev(1L, 1L, us(1)), Ev(1L, 2L, us(11)), Ev(1L, 3L, us(50)),
          Ev(1L, 4L, us(60))).toDS())
      .collect().sortBy(_.session_id)
      .map(s => (s.user_id, s.session_id, s.n_events, s.end_us)).toSeq
    assert(got === expected, s"got $got expected $expected")
    assert(got === Seq((1L, 1L, 2L, us(11)), (1L, 2L, 2L, us(60))))
  }

  test("TTL MERGE-drain: a restarted ordinal lands as its OWN row (start-keyed), not an overwrite") {
    // under TTL the ordinal restarts at 1, so the (user, session_id) key
    // would collide the restarted session with the user's first one and
    // MERGE would silently overwrite it — the TTL mode keys on
    // (user, start_us) instead; all three sessions must coexist
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-sess-ttlmerge").toString
    val in = s"$base/in"; val table = s"$base/table"
    Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def iso(min: Long) = java.time.Instant.ofEpochMilli(min * 60000L).toString
    def ev(u: Long, id: Long, min: Long) =
      s"""{"user_id":$u,"event_id":$id,"ts":"${iso(min)}"}"""
    def drain(): Option[String] = {
      val ds = spark.readStream.schema(schema).json(in)
        .selectExpr("user_id as _1", "event_id as _2", "ts as _3")
        .withWatermark("_3", "0 seconds")
        .as[(Long, Long, Timestamp)]
      Sessionize.drainSessionsMerge(ds, table, s"$base/ckpt",
        tombstoneTtlUs = Some(60L * 60L * 1000000L)) // 1 h
    }
    // sid 1 [1,11]; sid 2 [50]; gap to 500 is 450 min > 90 -> restart sid 1
    Files.writeString(Paths.get(in, "b1.json"),
      Seq(ev(1, 1, 1), ev(1, 2, 11)).mkString("\n"))
    drain()
    Files.writeString(Paths.get(in, "b2.json"), ev(1, 3, 50))
    drain()
    Files.writeString(Paths.get(in, "b3.json"), ev(1, 4, 500))
    drain()
    Files.writeString(Paths.get(in, "b4.json"), ev(9, 9, 100000))
    drain()
    Files.writeString(Paths.get(in, "b5.json"), ev(9, 8, 100001))
    val last = drain().getOrElse(fail("no committed snapshot"))
    val u1 = spark.read.parquet(last)
      .selectExpr("user_id", "session_id", "start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 == 1L).sortBy(_._3).toSeq
    assert(u1 === Seq((1L, 1L, us(1)), (1L, 2L, us(50)), (1L, 1L, us(500))),
      u1.mkString("; "))
  }

  test("q135 plan: every ttlOrdinals window rides the user key (no empty-key window)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sess = Sessionize.sessions(
        (0 until 200).map(i =>
          Ev(i % 7L, i.toLong, i * 40L * 60000000L)).toDS())
      .toDF()
    val q = Sessionize.ttlOrdinals(sess, Sessionize.TombstoneTtlUs)
    val plan = graft.operators.PlanWalk.executedPlanOf(q)
    val windows = graft.operators.PlanWalk.collectPlan(plan) {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty), plan.toString)
  }

  test("streaming event time keeps microsecond precision (gap + 1us cuts)") {
    // start at minute 10: a t == initial-watermark(0) row would drop as late
    val a = ts(10)
    val b = ts(40); b.setNanos(1000) // exactly 30 min + 1 microsecond later
    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withWm = input.toDS()
      .withColumnRenamed("_3", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
    val q = Sessionize.streamingSessions(withWm)
      .writeStream.format("memory").queryName("sess_us")
      .outputMode("append").start()
    input.addData((1L, 1L, a), (1L, 2L, b))
    q.processAllAvailable()
    input.addData((9L, 9L, ts(100000)))
    q.processAllAvailable()
    input.addData((9L, 8L, ts(100001)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_us").as[Sess].collect().filter(_.user_id == 1L)
    // ms truncation would read b as exactly gap -> ONE merged session
    assert(out.length === 2, out.mkString(";"))
    assert(out.map(_.end_us).max === us(40) + 1L)
  }
}
