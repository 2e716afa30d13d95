package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.etl.{Quarantine, SchemaDrift}
import graft.operators.Layout

/** Executable end-to-end example of the STORAGE-MAINTENANCE side of the
  * engine — the lifecycle every long-lived 100 TB table actually lives:
  *
  *   messy JSON batches land (corrupt lines, drifted producer schema)
  *   → PERMISSIVE quarantine split (bad lines kept verbatim)
  *   → alignTo(contract) (drifted columns dropped, order fixed)
  *   → per-batch appends pile up small files → byte-budgeted compaction
  *   → Z-order re-cluster → 2-D pruning measurably better than a sort
  *   → the quarantined lines are REPAIRED and replayed to convergence
  *
  * Every stage is an operator the driver gates elsewhere (q140/q139/
  * q138/q137); this main wires them into one self-verifying pipeline —
  * each step ASSERTS its claim, so a green run is a proof, not a
  * printout. Run: `sbt "runMain graft.examples.LayoutDemo"`.
  */
object LayoutDemo {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Files.createTempDirectory("graft-layout-demo").toString
    val landing = s"$base/landing"; val table = s"$base/table"
    Files.createDirectories(Paths.get(landing))

    // ---- 1. land 12 small JSON batches; every 13th line truncated
    // (closing brace dropped); batches 10-11 come from a "v2 producer" with an extra
    // field (PERMISSIVE reads ignore it; alignTo drops it from the frame)
    val nPerBatch = 100; val nBatches = 12
    def line(id: Long): String = {
      val whole = s"""{"id":$id,"x":${id % 40},"y":${id * 7 % 40},""" +
        s""""seg":"s${id % 4}"${if (id >= 1000) ""","extra":1""" else ""}}"""
      if (id % 13 == 3) whole.dropRight(1) else whole
    }
    (0 until nBatches).foreach { b =>
      val lines = (b * nPerBatch until (b + 1) * nPerBatch)
        .map(i => line(i.toLong)).mkString("", "\n", "\n")
      Files.write(Paths.get(s"$landing/batch-$b.json"), lines.getBytes("UTF-8"))
    }
    val total = nBatches * nPerBatch
    val expectBad = (0 until total).count(_ % 13 == 3)

    // ---- 2. quarantine split: the declared schema is the v2 producer's
    val v2 = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType),
      StructField("y", LongType), StructField("seg", StringType),
      StructField("extra", LongType)))
    val raw = spark.read.textFile(landing)
    val (clean, bad) = Quarantine.splitJson(spark, v2, raw)
    val badLines = bad.as[String].collect()
    assert(badLines.length == expectBad,
      s"quarantined ${badLines.length}, expected $expectBad")
    // verbatim: every quarantined line is exactly its truncated original
    assert(badLines.forall(l => !l.endsWith("}") && l.startsWith("{\"id\":")),
      "quarantine must keep raw lines untouched")
    assert(clean.count() == total - expectBad)

    // ---- 3. align the (drifted) clean frame onto the v1 contract
    val contract = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType),
      StructField("y", LongType), StructField("seg", StringType)))
    val aligned = SchemaDrift.alignTo(clean, contract)
    assert(aligned.schema.fieldNames.toSeq == Seq("id", "x", "y", "seg"))

    // ---- 4. per-batch appends -> small files -> compact
    (0 until 6).foreach { i => // 6 appends of 1/6 each: a file pileup
      aligned.filter(col("id") % 6 === i).write.mode("append").parquet(table)
    }
    def files(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files(table) >= 6, s"expected a small-file pileup, got ${files(table)}")
    val compacted = s"$base/compacted"
    val target = math.max(1L, Layout.datasetBytes(spark, table) / 3)
    Layout.compact(spark, table, compacted, targetFileBytes = target)
    val filesAfterCompact = files(compacted)
    assert(filesAfterCompact <= 4, s"compaction left $filesAfterCompact files")
    val cnt = spark.read.parquet(compacted).count()
    val sumId = spark.read.parquet(compacted).agg(sum("id")).head.getLong(0)
    assert(cnt == total - expectBad, "compaction lost rows")

    // ---- 5. Z-order re-cluster; a thin y-band must overlap FEWER
    // partition bounding boxes than a linear sort on x (which cannot
    // prune y at all)
    def boxes(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pid", spark_partition_id()).groupBy("pid")
        .agg(min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    def overlapY(bx: Array[(Long, Long)], lo: Long, hi: Long): Int =
      bx.count { case (y0, y1) => y1 >= lo && y0 <= hi }
    val src = spark.read.parquet(compacted)
    val z = boxes(Layout.zorderBy(src, "x", "y", numPartitions = 8))
    val linear = boxes(src.repartitionByRange(8, col("x")))
    val (zHit, linHit) = (overlapY(z, 10L, 14L), overlapY(linear, 10L, 14L))
    assert(linHit == linear.length, "linear-by-x should never prune a y-band")
    assert(zHit < linHit, s"z-order must prune the y-band: $zHit vs $linHit")

    // ---- 6. repair + replay the quarantine: the producer fix restores
    // the truncated suffix; re-split finds nothing bad; the replayed rows
    // converge the table to exactly the landed id space
    val repaired = bad.as[String].map(_ + "}")
    val (fixedClean, fixedBad) = Quarantine.splitJson(spark, v2, repaired)
    assert(fixedBad.count() == 0, "repair left corrupt lines behind")
    SchemaDrift.alignTo(fixedClean, contract)
      .write.mode("append").parquet(compacted)
    val finalIds = spark.read.parquet(compacted)
    assert(finalIds.count() == total && finalIds.select("id").distinct()
      .count() == total, "replay must converge to every landed row")
    assert(finalIds.agg(sum("id")).head.getLong(0)
      == (0 until total).map(_.toLong).sum, "id mass mismatch after replay")
    assert(sumId < (0 until total).map(_.toLong).sum) // pre-replay was short

    println(s"LayoutDemo OK: $total landed, $expectBad quarantined+replayed, " +
      s"${files(table)}->$filesAfterCompact files after compaction, " +
      s"y-band boxes $zHit/$linHit (z-order vs linear)")
    spark.stop()
  }
}
