package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.stream.DedupWithin.KEv

/** Anchor-hop dedup: batch-twin semantics pinned exactly, and
  * batch ≡ streaming (`dropDuplicatesWithinWatermark`) on the case the
  * operator's Scaladoc promises — anchors separated far enough that the
  * watermark clears the old state entry before the next anchor arrives.
  */
class DedupWithinSpec extends SparkSpec {
  import spark.implicits._

  private val MinUs = 60L * 1000000L
  private def tUs(min: Long): Long = min * MinUs
  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)
  private val H = 60L * MinUs // 60-minute horizon for the unit tests

  private def run(evs: Seq[KEv]): Seq[KEv] =
    DedupWithin.dedupWithin(evs.toDS(), H).collect().toSeq
      .sortBy(e => (e.user_id, e.event_type, e.t, e.event_id))

  test("first event per key is always kept; in-horizon events drop") {
    val out = run(Seq(
      KEv(1, "a", 1, tUs(0)), KEv(1, "a", 2, tUs(30)), KEv(1, "a", 3, tUs(59))))
    assert(out.map(_.event_id) === Seq(1L))
  }

  test("dropped events do NOT extend the horizon (anchor, not gap, semantics)") {
    // 0 kept, 45 dropped, 90 within 60 of the 45-drop but PAST the anchor
    // 0+60 -> kept. A gap-chained (sessionization) cut would drop 90.
    val out = run(Seq(
      KEv(1, "a", 1, tUs(0)), KEv(1, "a", 2, tUs(45)), KEv(1, "a", 3, tUs(90))))
    assert(out.map(_.event_id) === Seq(1L, 3L))
  }

  test("horizon boundary is strict: exactly +H drops, +H+1us keeps") {
    val boundary = run(Seq(KEv(1, "a", 1, tUs(0)), KEv(1, "a", 2, tUs(60))))
    assert(boundary.map(_.event_id) === Seq(1L))
    val past = run(Seq(
      KEv(1, "a", 1, tUs(0)), KEv(1, "a", 2, tUs(60) + 1L)))
    assert(past.map(_.event_id) === Seq(1L, 2L))
  }

  test("keys are independent; ties on t break by event_id") {
    val out = run(Seq(
      KEv(1, "a", 9, tUs(0)), KEv(1, "a", 4, tUs(0)), // tie: keep id 4
      KEv(1, "b", 5, tUs(10)), KEv(2, "a", 6, tUs(10))))
    assert(out.map(_.event_id).toSet === Set(4L, 5L, 6L))
  }

  test("anchor-hop invariants hold on a dense randomized-shape sequence") {
    // deterministic pseudo-random times: multiplicative hash, minutes 0..599
    val evs = (0 until 400).map { i =>
      val t = math.abs(i * 2654435761L % 600L)
      KEv(i % 3, if (i % 2 == 0) "a" else "b", i.toLong, tUs(t))
    }
    val kept = run(evs)
    val byKey = kept.groupBy(e => (e.user_id, e.event_type))
    evs.groupBy(e => (e.user_id, e.event_type)).foreach { case (k, all) =>
      val ks = byKey(k).sortBy(e => (e.t, e.event_id))
      val first = all.minBy(e => (e.t, e.event_id))
      assert(ks.head === first, s"first event of $k must anchor")
      ks.sliding(2).foreach {
        case Seq(a, b) => assert(b.t - a.t > H, s"kept gap within horizon for $k")
        case _ =>
      }
      // every dropped event sits inside the horizon of the latest anchor
      // at or before it
      val keptSet = ks.map(_.event_id).toSet
      all.filterNot(e => keptSet(e.event_id)).foreach { d =>
        val anchor = ks.filter(a => a.t < d.t ||
          (a.t == d.t && a.event_id < d.event_id)).last
        assert(d.t - anchor.t <= H, s"dropped event outside horizon for $k")
      }
    }
  }

  test("streaming dropDuplicatesWithinWatermark matches the batch twin " +
    "when the watermark clears state between anchors") {
    val input = MemoryStream[(Long, String, Long, Timestamp)](spark)
    val df = input.toDF()
      .toDF("user_id", "event_type", "event_id", "ts")
    val q = DedupWithin.streamingDedup(df, "60 minutes")
      .writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    def drain(): Unit = q.processAllAvailable()

    // times start at minute 1: a t == initial-watermark (epoch) row would
    // be dropped as late before the dedup operator ever saw it
    // batch 1: anchor + in-horizon duplicate -> only the anchor emits
    input.addData((1L, "a", 1L, ts(1)), (1L, "a", 2L, ts(11)))
    drain()
    // batch 2: another key at minute 131 -> watermark to 71, past the
    // anchor's 61-minute expiry; its state entry is evicted at batch end
    input.addData((2L, "b", 3L, ts(131)))
    drain()
    // batch 3: same key again at minute 201 -> beyond the (cleared)
    // anchor: kept, exactly like the batch twin
    input.addData((1L, "a", 4L, ts(201)))
    drain()
    q.stop()

    val streamed = spark.table("ddw_out")
      .select("user_id", "event_type", "event_id").as[(Long, String, Long)]
      .collect().toSet
    val batch = DedupWithin.dedupWithin(Seq(
      KEv(1, "a", 1, tUs(1)), KEv(1, "a", 2, tUs(11)),
      KEv(2, "b", 3, tUs(131)), KEv(1, "a", 4, tUs(201))).toDS(), H)
      .collect().map(e => (e.user_id, e.event_type, e.event_id)).toSet
    assert(streamed === batch)
    assert(batch === Set((1L, "a", 1L), (2L, "b", 3L), (1L, "a", 4L)))
  }

  test("inside the 2×delay window the first divergence is one-sided: " +
    "streaming drops an event the batch twin keeps") {
    val input = MemoryStream[(Long, String, Long, Timestamp)](spark)
    val df = input.toDF().toDF("user_id", "event_type", "event_id", "ts")
    val q = DedupWithin.streamingDedup(df, "60 minutes")
      .writeStream.format("memory").queryName("ddw_div")
      .outputMode("append").start()
    // anchor at minute 1; the watermark after this batch stays at the epoch
    input.addData((1L, "a", 1L, ts(1)))
    q.processAllAvailable()
    // minute 70 is PAST the 60-minute horizon — the batch twin keeps it —
    // but the watermark has not reached the anchor's 61-minute expiry, so
    // the state entry is still alive and streaming drops it
    input.addData((1L, "a", 2L, ts(70)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ddw_div").select("event_id")
      .as[Long].collect().toSet
    val batch = DedupWithin.dedupWithin(Seq(
      KEv(1, "a", 1, tUs(1)), KEv(1, "a", 2, tUs(70))).toDS(), H)
      .collect().map(_.event_id).toSet
    assert(batch === Set(1L, 2L))
    assert(streamed === Set(1L))
    assert(streamed.subsetOf(batch)) // first-hop containment direction
  }

  test("a cascade can flip the divergence direction: a streaming-dropped " +
    "batch-anchor never created state, so a later event inside its batch " +
    "horizon is streaming-kept") {
    val input = MemoryStream[(Long, String, Long, Timestamp)](spark)
    val df = input.toDF().toDF("user_id", "event_type", "event_id", "ts")
    val q = DedupWithin.streamingDedup(df, "60 minutes")
      .writeStream.format("memory").queryName("ddw_casc")
      .outputMode("append").start()
    input.addData((1L, "a", 1L, ts(1)))
    q.processAllAvailable()
    // batch-kept (69 min past the anchor), streaming-dropped (state alive)
    input.addData((1L, "a", 2L, ts(70)))
    q.processAllAvailable()
    // unrelated key pushes the watermark to minute 71 → the minute-1
    // entry expires at batch end
    input.addData((9L, "z", 9L, ts(131)))
    q.processAllAvailable()
    // minute 100: inside the BATCH horizon of the minute-70 anchor (the
    // batch twin drops it), but not late (event time > watermark 71) and
    // streaming has no state for the key any more — streaming keeps it
    input.addData((1L, "a", 3L, ts(100)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ddw_casc").select("event_id")
      .as[Long].collect().toSet
    val batch = DedupWithin.dedupWithin(Seq(
      KEv(1, "a", 1, tUs(1)), KEv(1, "a", 2, tUs(70)),
      KEv(9, "z", 9, tUs(131)), KEv(1, "a", 3, tUs(100))).toDS(), H)
      .collect().map(_.event_id).toSet
    assert(batch === Set(1L, 2L, 9L))
    assert(streamed === Set(1L, 9L, 3L)) // id2 extra-dropped, id3 extra-kept
  }
}
