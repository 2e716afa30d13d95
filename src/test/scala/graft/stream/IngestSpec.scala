package graft.stream

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{ReviewEtl, Schemas}

/** End-to-end Structured-Streaming drain: files land in a domain dir, one
  * AvailableNow drain appends them, a second drain with the same checkpoint
  * processes nothing new (the exactly-once file index that replaces the
  * reference's Lambda, SURVEY.md §2.9).
  */
class IngestSpec extends SparkSpec {

  def writeJson(dir: String, name: String, lines: String*): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))
  }

  def review(id: String): String =
    s"""{"review_id":"$id","user_id":"u_$id","business_id":"b_$id","stars":4.0,"useful":1,"funny":0,"cool":0,"text":"great","date":"2021-05-01 12:30:00"}"""

  test("AvailableNow drain: appends new files once, skips them on re-run") {
    val base = Files.createTempDirectory("graft-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    writeJson(in, "batch_1.json", review("r1"), review("r2"))
    writeJson(in, "ignored.txt", "not json") // pathGlobFilter must skip this

    Ingest.drainToParquet(spark, Schemas.review, in, ReviewEtl.transform, out, ckpt)
    assert(spark.read.parquet(out).count() == 2)

    // re-deliver the same file name + a genuinely new file
    writeJson(in, "batch_2.json", review("r3"))
    Ingest.drainToParquet(spark, Schemas.review, in, ReviewEtl.transform, out, ckpt)
    val got = spark.read.parquet(out)
    assert(got.count() == 3) // batch_1 NOT reprocessed (no append duplication)
    assert(got.select("review_id").collect().map(_.getString(0)).sorted.toSeq
      == Seq("r1", "r2", "r3"))
    // transform ran inside the stream: derived columns present
    assert(got.columns.contains("sentiment_score"))
  }

  test("MERGE drain: re-delivered + changed rows converge to the merged state, exactly once") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-merge").toString
    val in = s"$base/in"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("p", DoubleType),
      StructField("action", StringType)))
    def row(k: Long, p: Double, action: String = "upsert") =
      s"""{"k":$k,"p":$p,"action":"$action"}"""
    def drain(): String = Ingest.drainMergeToParquet(
      spark, schema, in, identity, "k", Seq("p"), table, ckpt)
      .getOrElse(fail("no committed snapshot after drain"))
    def state(path: String): Map[Long, Double] =
      spark.read.parquet(path).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // batch 1: two inserts (plus an exact in-batch re-delivery of k=1 and
    // a JSON-null action, which the drain must read as an upsert)
    writeJson(in, "b1.json", row(1, 10.0), row(2, 20.0), row(1, 10.0),
      """{"k":7,"p":70.0,"action":null}""")
    val v1 = drain()
    assert(state(v1) === Map(1L -> 10.0, 2L -> 20.0, 7L -> 70.0))

    // batch 2, new file: k=1 re-delivered IDENTICALLY, k=2 changed,
    // k=3 new, and a delete for a key that never existed (no-op)
    writeJson(in, "b2.json", row(1, 10.0), row(2, 25.0), row(3, 30.0),
      row(99, 0.0, action = "delete"))
    val v2 = drain()
    assert(state(v2) === Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0, 7L -> 70.0))

    // batch 3: delete k=1; batch 4: re-deliver batch-2 CONTENT in a new
    // file — the merge must converge (k=2/k=3 rewritten identically,
    // k=1 re-inserted deterministically)
    writeJson(in, "b3.json", row(1, 0.0, action = "delete"))
    val v3 = drain()
    assert(state(v3) === Map(2L -> 25.0, 3L -> 30.0, 7L -> 70.0))

    // exactly-once at the FILE level: draining with no new files writes no
    // new version and the latest snapshot is unchanged
    val v3again = drain()
    assert(v3again === v3)
    assert(state(v3again) === Map(2L -> 25.0, 3L -> 30.0, 7L -> 70.0))

    // vacuum keeps only the newest snapshots; the survivor still reads
    val removed = Ingest.vacuumSnapshots(spark, table, keep = 1)
    assert(removed === Seq("v000000", "v000001"))
    assert(state(drain()) === Map(2L -> 25.0, 3L -> 30.0, 7L -> 70.0))

    // a torn version (no _SUCCESS) from a crashed writer is invisible:
    // the next drain merges from the committed state, numbering is not
    // advanced by the junk, and vacuum clears the debris
    val torn = Paths.get(table, "v000099")
    Files.createDirectories(torn)
    Files.writeString(torn.resolve("junk.parquet"), "not parquet")
    writeJson(in, "b5.json", row(4, 40.0))
    val v4 = drain()
    assert(v4.endsWith("v000003"), v4)
    assert(state(v4) === Map(2L -> 25.0, 3L -> 30.0, 4L -> 40.0, 7L -> 70.0))
    assert(Ingest.vacuumSnapshots(spark, table, keep = 1)
      === Seq("v000002", "v000099"))
  }

  test("manifest is the commit point: torn AND committed-looking versions ahead of a stale manifest resolve to the manifest version") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-manifest").toString
    val in = s"$base/in"; val table = s"$base/table"; val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("p", DoubleType)))
    def drain(): String = Ingest.drainMergeToParquet(
      spark, schema, in, identity, "k", Seq("p"), table, ckpt)
      .getOrElse(fail("no committed snapshot after drain"))
    def state(path: String): Map[Long, Double] =
      spark.read.parquet(path).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    writeJson(in, "b1.json", """{"k":1,"p":10.0}""")
    assert(drain().endsWith("v000000"))

    // crash case A: a torn write of v{N} (no _SUCCESS) with the manifest
    // still at v{N-1} — resolution must be v{N-1}
    val tornV1 = Paths.get(table, "v000001")
    Files.createDirectories(tornV1)
    Files.writeString(tornV1.resolve("part-junk.parquet"), "not parquet")
    val afterTorn = drain() // no new files: resolves, writes nothing
    assert(afterTorn.endsWith("v000000"), afterTorn)

    // crash case B: the parquet write of v{N+1} COMPLETED (has _SUCCESS)
    // but the writer died before the manifest update — the snapshot is
    // uncommitted (its batch will be replayed) and must stay invisible,
    // which a _SUCCESS-listing protocol gets wrong
    val aheadV2 = Paths.get(table, "v000002")
    Files.createDirectories(aheadV2)
    Files.writeString(aheadV2.resolve("_SUCCESS"), "")
    Files.writeString(aheadV2.resolve("part-junk.parquet"), "not parquet")
    assert(drain().endsWith("v000000"))

    // the next real batch re-uses the torn number and commits past it
    writeJson(in, "b2.json", """{"k":2,"p":20.0}""")
    val v1 = drain()
    assert(v1.endsWith("v000001"), v1)
    assert(state(v1) === Map(1L -> 10.0, 2L -> 20.0))

    // vacuum treats the never-committed v000002 as debris (it is AHEAD of
    // the manifest) and never touches the manifest's own version
    assert(Ingest.vacuumSnapshots(spark, table, keep = 1)
      === Seq("v000000", "v000002"))
    assert(state(drain()) === Map(1L -> 10.0, 2L -> 20.0))
  }

  test("latestVersion fallback never resurrects a snapshot ahead of the manifest; corrupt manifest refuses") {
    import org.apache.hadoop.fs.Path
    val base = Files.createTempDirectory("graft-latest").toString
    val table = new Path(base)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkVersion(v: Int, committed: Boolean): Unit = {
      val d = Paths.get(base, f"v$v%06d")
      Files.createDirectories(d)
      Files.writeString(d.resolve("part-junk.parquet"), "x")
      if (committed) Files.writeString(d.resolve("_SUCCESS"), "")
    }
    // double failure: manifest points at v1 which is TORN, while v0 is
    // committed and v2 completed its parquet write (has _SUCCESS) but was
    // never committed (writer died before the manifest PUT). The fallback
    // must resolve to v0 — an unconstrained max-_SUCCESS would resurrect
    // the unreplayed v2.
    mkVersion(0, committed = true)
    mkVersion(1, committed = false)
    mkVersion(2, committed = true)
    Files.writeString(Paths.get(base, "_latest"), "1")
    assert(Ingest.latestVersion(fs, table) === Some(0L))
    // manifest-less legacy table: max-_SUCCESS listing applies
    Files.delete(Paths.get(base, "_latest"))
    assert(Ingest.latestVersion(fs, table) === Some(2L))
    // corrupt manifest: refuse rather than guess the commit point
    Files.writeString(Paths.get(base, "_latest"), "garbage ")
    val e = intercept[IllegalStateException](Ingest.latestVersion(fs, table))
    assert(e.getMessage.contains("unparseable snapshot manifest"))
  }

  test("incremental screen in foreachBatch: re-delivered CONTENT adds zero rows") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-screen").toString
    val in = s"$base/in"; val corpusDir = s"$base/corpus"; val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val textA = "the quick brown fox jumps over the lazy dog today"
    val novel = "completely different words about distributed query engines and planning"

    // seed corpus
    import spark.implicits._
    Seq(1L -> textA).toDF("doc_id", "text").write.parquet(corpusDir)

    // the admission-controlled sink: screen each micro-batch against the
    // CURRENT corpus (seed + everything admitted so far), append survivors
    def drain(): Unit =
      Ingest.drainForeachBatch(spark, schema, in, identity, ckpt) { (batch, _) =>
        val corpus = spark.read.parquet(corpusDir)
        val admitted = graft.dedup.Dedup
          .screenBatch(corpus, batch, k = 5, threshold = 0.5)
          .filter(col("admitted"))
          .select(col("doc_id"))
          .join(batch, "doc_id")
        admitted.write.mode("append").parquet(corpusDir)
      }

    // batch 1: one verbatim copy of a corpus doc + one novel doc
    writeJson(in, "batch_1.json", doc(10, textA), doc(11, novel))
    drain()
    assert(spark.read.parquet(corpusDir).count() == 2) // seed + novel only

    // batch 2: the SAME content re-delivered under a new doc_id in a new
    // file — the file index can't help (new file), the screen must:
    // the novel doc from batch 1 is now corpus, so its copy is an exact dup
    writeJson(in, "batch_2.json", doc(12, novel))
    drain()
    assert(spark.read.parquet(corpusDir).count() == 2) // zero rows added
  }
}
