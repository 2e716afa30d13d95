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
