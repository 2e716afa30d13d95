package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.stream.{Ingest, Sessionize}

/** Executable end-to-end example of the STREAMING side of the engine —
  * the §2.9 story composed the way CorpusDemo composes curation:
  *
  *   JSON event files land → AvailableNow sessionizer (TTL tombstones)
  *   → MERGE-upsert snapshot sink (versioned, manifest-committed)
  *   → crash debris ignored → vacuum → converges to the batch cut
  *
  * Every stage is an operator the driver gates elsewhere (q122/q135 for
  * the session semantics, IngestSpec/SessionizeSpec for the sink); this
  * main wires them into one self-verifying pipeline run — each step
  * ASSERTS its claim, so a green run is a proof, not a printout.
  *
  * Run: `sbt "runMain graft.examples.StreamDemo"`.
  */
object StreamDemo {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Files.createTempDirectory("graft-stream-demo").toString
    val in = s"$base/in"; val table = s"$base/sessions"
    Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def iso(min: Long) = java.time.Instant.ofEpochMilli(min * 60000L).toString
    def ev(u: Long, id: Long, min: Long) =
      s"""{"user_id":$u,"event_id":$id,"ts":"${iso(min)}"}"""
    def drop(name: String, lines: String*): Unit =
      Files.writeString(Paths.get(in, name), lines.mkString("\n"))
    val ttl = Some(Sessionize.TombstoneTtlUs) // 6 h — the q135 knob
    def drain(ckpt: String): Option[String] = {
      val ds = spark.readStream.schema(schema).json(in)
        .selectExpr("user_id as _1", "event_id as _2", "ts as _3")
        .withWatermark("_3", "0 seconds")
        .as[(Long, Long, java.sql.Timestamp)]
      Sessionize.drainSessionsMerge(ds, table, s"$base/$ckpt", ttl)
    }
    def tableRows(path: String): Set[(Long, Long, Long)] =
      spark.read.parquet(path)
        .selectExpr("user_id", "session_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // 1. two files of user-1 events: session [1,11] closes on the data
    //    path when minute-50 arrives; flush events (user 9) time out the
    //    rest — the MERGE table lands one row per closed session
    drop("b1.json", ev(1, 1, 1), ev(1, 2, 11))
    drain("ckpt")
    drop("b2.json", ev(1, 3, 50))
    drain("ckpt")
    drop("b3.json", ev(9, 9, 100000))
    drain("ckpt")
    drop("b4.json", ev(9, 8, 100001))
    val v1 = drain("ckpt")
      .getOrElse(sys.error("no committed snapshot after drain 1"))
    println(s"1 drains 1-4       -> $v1 : ${tableRows(v1)}")
    // user 1's two sessions are closed (sids 1 and 2); user 9's flush
    // session is still open, so it has no row yet
    assert(tableRows(v1) == Set((1L, 1L, 2L), (1L, 2L, 1L)),
      s"unexpected state after first drains: ${tableRows(v1)}")

    // 2. REPLAY: a fresh query instance (stale/lost checkpoint) re-reads
    //    every file already in the input dir and RE-EMITS its sessions —
    //    the MERGE keys make them rewrite their rows, not duplicate them
    val v2 = drain("ckpt2")
      .getOrElse(sys.error("no committed snapshot after replay drain"))
    println(s"2 replay drain     -> $v2 : ${tableRows(v2)}")
    assert(tableRows(v2) == tableRows(v1),
      "re-delivered sessions must rewrite, not append")

    // 3. CRASH DEBRIS: a torn snapshot (no _SUCCESS) and a completed-but-
    //    uncommitted one (writer died before the manifest PUT) appear
    //    ahead of the manifest; the commit point must not move and the
    //    resolved table must be unchanged — the exact double-failure the
    //    manifest protocol exists to hide
    val latest = Paths.get(v2).getFileName.toString.stripPrefix("v").toLong
    def fakeVersion(v: Long, committed: Boolean): Unit = {
      val d = Paths.get(table, f"v$v%06d")
      Files.createDirectories(d)
      Files.writeString(d.resolve("part-junk.parquet"), "not parquet")
      if (committed) Files.writeString(d.resolve("_SUCCESS"), "")
    }
    fakeVersion(latest + 1, committed = false) // torn write
    fakeVersion(latest + 2, committed = true)  // completed, uncommitted
    val manifestV = Files.readString(Paths.get(table, "_latest")).trim.toLong
    println(f"3 crash debris     -> commit point still v$manifestV%06d")
    assert(manifestV == latest, "debris must not move the commit point")
    assert(tableRows(f"$table/v$manifestV%06d") == tableRows(v2),
      "resolved state must ignore the uncommitted snapshots")

    // 4. user 1 returns FAR past gap+ttl (ordinal restarts at 1), flush
    //    events close it; the new commits overwrite the debris numbers
    //    (torn-write self-heal), then VACUUM sweeps superseded versions
    //    but never the live one
    drop("b6.json", ev(1, 4, 100100))
    drain("ckpt")
    drop("b7.json", ev(9, 7, 300000))
    drain("ckpt")
    drop("b8.json", ev(9, 6, 300001))
    val v4 = drain("ckpt")
      .getOrElse(sys.error("no committed snapshot after flush drain"))
    val removed = Ingest.vacuumSnapshots(spark, table, keep = 1)
    println(s"4 vacuum           -> live $v4, removed ${removed.mkString(", ")}")
    assert(!removed.contains(Paths.get(v4).getFileName.toString),
      "vacuum must never remove the live snapshot")
    assert(tableRows(v4).nonEmpty, "live snapshot must survive the vacuum")

    // 5. CONVERGENCE: the final MERGE table equals the batch ttlOrdinals
    //    cut over every user-1 event ever delivered — the lakehouse
    //    claim the composition exists for. Minute 100100 is far past
    //    gap+ttl after session 2, so the batch cut restarts user 1's
    //    ordinal at 1 — and so must the streamed table.
    val batch = Sessionize.ttlOrdinals(
        Sessionize.sessions(Seq(
          Sessionize.Ev(1L, 1L, 1L * 60000000L),
          Sessionize.Ev(1L, 2L, 11L * 60000000L),
          Sessionize.Ev(1L, 3L, 50L * 60000000L),
          Sessionize.Ev(1L, 4L, 100100L * 60000000L)).toDS()).toDF(),
        ttl.get)
      .selectExpr("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = tableRows(v4).filter(_._1 == 1L)
    println(s"5 convergence      -> streamed $streamed == batch $batch")
    assert(streamed == batch,
      s"MERGE table diverged from the batch cut: $streamed vs $batch")
    assert(streamed.exists { case (_, sid, _) => sid == 1L } &&
      streamed.size == 3, "expected the TTL ordinal restart at minute 100100")

    // 6. IVM CHAIN: a continuously-maintained aggregate riding the same
    //    commit protocol — three signed delta batches (inserts, an
    //    update pair, a delete-to-zero) through Ivm.maintainChain, then
    //    maintained ≡ rebuilt on the final commit. The lifecycle claim:
    //    the "base facts" are read once ever; each commit costs
    //    O(|delta| + |view|).
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ivmTable = s"$base/ivm_view"
    val deltas = Seq(
      Seq((10L, 1L, 5.0), (11L, 1L, 3.0), (10L, 1L, 2.0)),
      Seq((11L, -1L, 3.0), (11L, 1L, 4.5)),
      Seq((10L, -1L, 5.0), (10L, -1L, 2.0)))
    val ivmPath = deltas.map(d => graft.etl.Ivm.maintainChain(
      spark, ivmTable, d.toDF("key", "sign", "value"))).last
    val ivmView = spark.read.parquet(ivmPath)
      .select(col("key"), col("n"), col("total")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"6 ivm chain        -> $ivmPath : $ivmView")
    assert(ivmView == Set((11L, 1L, 4.5)),
      s"maintained view diverged from the rebuild: $ivmView")

    println("StreamDemo: all assertions passed")
    spark.stop()
  }
}
