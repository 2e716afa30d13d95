package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC compaction contracts: per-key winner semantics on a planted
  * micro-log (tie-break on seq, tombstone drop, delete-reinsert, late
  * op absorbed), order-insensitivity, and the segment-merge law —
  * compacting shards independently with tombstones retained then
  * merging equals compacting the whole log at once (the LSM rule that
  * makes per-partition compaction sound at 100 TB).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // key 1: I then U               → U payload wins
  // key 2: I then D               → gone from the snapshot
  // key 3: I, D, then later I     → re-inserted payload survives
  // key 4: two U at the SAME ts   → seq 2 wins
  // key 5: I, then a LATE U whose ts precedes the insert → insert wins
  private val log = Seq(
    (1L, ts("2024-01-01 00:00:00"), 1L, "I", "A", Some(10.0)),
    (1L, ts("2024-01-02 00:00:00"), 1L, "U", "B", Some(11.0)),
    (2L, ts("2024-01-01 00:00:00"), 1L, "I", "A", Some(20.0)),
    (2L, ts("2024-01-03 00:00:00"), 1L, "D", null, None),
    (3L, ts("2024-01-01 00:00:00"), 1L, "I", "A", Some(30.0)),
    (3L, ts("2024-01-02 00:00:00"), 1L, "D", null, None),
    (3L, ts("2024-01-04 00:00:00"), 1L, "I", "C", Some(33.0)),
    (4L, ts("2024-01-02 00:00:00"), 1L, "U", "P", Some(40.0)),
    (4L, ts("2024-01-02 00:00:00"), 2L, "U", "F", Some(44.0)),
    (4L, ts("2024-01-01 00:00:00"), 1L, "I", "A", Some(41.0)),
    (5L, ts("2024-01-05 00:00:00"), 1L, "I", "A", Some(50.0)),
    (5L, ts("2024-01-02 00:00:00"), 1L, "U", "B", Some(51.0)))
    .toDF("key", "ts", "seq", "op", "status", "price")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    Cdc.compact(df, Seq("key"), Seq("ts", "seq"))
      .collect()
      .map(r => (r.getLong(0), r.getString(3), r.getDouble(4), r.getLong(5)))
      .toSet

  test("planted winners: update, tombstone, delete-reinsert, seq tie, " +
    "late op absorbed") {
    assert(snap(log) == Set(
      (1L, "B", 11.0, 2L),
      (3L, "C", 33.0, 3L),
      (4L, "F", 44.0, 3L),
      (5L, "A", 50.0, 2L)))
  }

  test("order-insensitive: a reversed, repartitioned log compacts " +
    "identically") {
    val shuffled = log.orderBy(col("ts").desc, col("key").desc)
      .repartition(7)
    assert(snap(shuffled) == snap(log))
  }

  test("segment-merge law: per-shard compaction with tombstones kept, " +
    "then merge, equals whole-log compaction") {
    // shard split chosen so key 3's delete and re-insert land in
    // DIFFERENT segments — the case where dropping tombstones early
    // would resurrect the base row
    val l1 = log.filter(col("ts") < ts("2024-01-03 00:00:00"))
    val l2 = log.filter(col("ts") >= ts("2024-01-03 00:00:00"))
    val seg1 = Cdc.compact(l1, Seq("key"), Seq("ts", "seq"),
      dropTombstones = false)
    val seg2 = Cdc.compact(l2, Seq("key"), Seq("ts", "seq"),
      dropTombstones = false)
    assert(snap(seg1.unionByName(seg2)) == snap(log))
  }

  test("dropping tombstones in segments is UNSOUND: key 2 would " +
    "resurrect nothing but key ordering still matters — deleted key " +
    "absent only when its tombstone survives the merge") {
    val l1 = log.filter(col("ts") < ts("2024-01-03 00:00:00"))
    val l2 = log.filter(col("ts") >= ts("2024-01-03 00:00:00"))
    // key 2's insert is in l1, its tombstone in l2; early tombstone
    // DROP in l2's segment (then re-ingesting the snapshot as inserts,
    // the realistic mistake) leaves l1's insert as the merged winner
    val badSeg2 = Cdc.compact(l2, Seq("key"), Seq("ts", "seq"),
      dropTombstones = true).withColumn("op", lit("I"))
    val seg1 = Cdc.compact(l1, Seq("key"), Seq("ts", "seq"),
      dropTombstones = false)
    assert(snap(seg1.unionByName(badSeg2)).exists(_._1 == 2L),
      "the divergence case the law guards against should reproduce")
  }

  test("q168 snapshot on testdata: deleted residue absent, re-inserts " +
    "survive, n_ops consistent") {
    val out = Cdc.cdcSnapshotQuery(spark, "/root/testdata/sf0.001").cache()
    try {
      val keys = out.select("o_orderkey").as[Long].collect().toSet
      assert(keys.nonEmpty)
      // %5-not-%15 keys tombstoned; %15 keys re-inserted
      assert(!keys.exists(k => k % 5 == 0 && k % 15 != 0))
      val re = out.filter(col("o_orderkey") % 15 === 0)
      assert(re.filter(col("status") =!= "O").count() == 0)
      // every surviving key's op count matches its residue classes
      val bad = out.withColumn("expect",
          lit(1L)
            + when(col("o_orderkey") % 3 === 0, 1L).otherwise(0L)
            + when(col("o_orderkey") % 7 === 0, 2L).otherwise(0L)
            + when(col("o_orderkey") % 5 === 0, 1L).otherwise(0L)
            + when(col("o_orderkey") % 15 === 0, 1L).otherwise(0L))
        .filter(col("n_ops") =!= col("expect")).count()
      assert(bad == 0L)
    } finally spark.catalog.clearCache()
  }

  test("streaming CDC apply: time-windowed batches through segment-" +
    "compact -> toMergeActions -> versioned MERGE snapshots converge to " +
    "whole-log compaction") {
    import graft.operators.MergeInto
    import graft.stream.Ingest
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-apply")
      .toString
    val payload = Seq("ts", "seq", "status", "price")
    val cuts = Seq(ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00"))
    val batches = Seq(
      log.filter(col("ts") <= cuts(0)),
      log.filter(col("ts") > cuts(0) && col("ts") <= cuts(1)),
      log.filter(col("ts") > cuts(1)))
    val paths = batches.map { b =>
      val changes = Cdc.toMergeActions(
        Cdc.compact(b, Seq("key"), Seq("ts", "seq"), dropTombstones = false))
      Ingest.advanceSnapshot(spark, dir,
        changes.drop("action").limit(0)) { base =>
        MergeInto.merge(base, changes, "key", payload).drop("op")
      }
    }
    assert(paths.distinct.size === 3) // three committed versions
    val got = spark.read.parquet(Ingest.latestSnapshotPath(spark, dir).get)
      .select("key", "ts", "seq", "status", "price").collect().toSet
    val want = Cdc.compact(log, Seq("key"), Seq("ts", "seq"))
      .select("key", "ts", "seq", "status", "price").collect().toSet
    assert(got === want)
    // and the chain actually exercised every op kind: key 2 deleted in
    // batch 2, key 3 tombstoned and re-inserted across batches
    val keys = got.map(_.getLong(0))
    assert(!keys.contains(2L) && keys.contains(3L))
  }

  test("UNORDERED shards through sequential MERGE diverge — the " +
    "counterexample that makes time-ordering the stream-apply contract " +
    "(unordered segments must use the compact merge law)") {
    import graft.operators.MergeInto
    val l = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "I", "A", Some(10.0)),
      (1L, ts("2024-01-02 00:00:00"), 1L, "U", "B", Some(11.0)))
      .toDF("key", "ts", "seq", "op", "status", "price")
    val newer = l.filter(col("ts") > ts("2024-01-01 12:00:00"))
    val older = l.filter(col("ts") <= ts("2024-01-01 12:00:00"))
    val payload = Seq("ts", "seq", "status", "price")
    def seg(b: org.apache.spark.sql.DataFrame) =
      Cdc.compact(b, Seq("key"), Seq("ts", "seq"), dropTombstones = false)
    // newer batch applied FIRST, older second: MERGE regresses to "A"
    val empty = Cdc.toMergeActions(seg(newer)).drop("action").limit(0)
    val merged = MergeInto.merge(
      MergeInto.merge(empty,
        Cdc.toMergeActions(seg(newer)), "key", payload).drop("op"),
      Cdc.toMergeActions(seg(older)), "key", payload)
      .select("status").as[String].collect()
    assert(merged === Array("A")) // the regression
    // the compact merge law on the SAME shards gets it right
    val law = Cdc.compact(seg(newer).unionByName(seg(older)),
      Seq("key"), Seq("ts", "seq"))
      .select("status").as[String].collect()
    assert(law === Array("B"))
  }
}
