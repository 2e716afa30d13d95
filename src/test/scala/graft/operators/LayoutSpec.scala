package graft.operators

import graft.SparkSpec
import graft.Tables

class LayoutSpec extends SparkSpec {

  test("compaction: many small files → byte-budgeted few, data intact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // 64 tiny files
    (0L until 6400L).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 64)
    val target = math.max(1L, Layout.datasetBytes(spark, in) / 4)
    val n = Layout.compact(spark, in, out, targetFileBytes = target)
    assert(n <= 5 && parquetFiles(out) <= 5) // ~4 target-size files
    assert(spark.read.parquet(out).count() == 6400)
    assert(spark.read.parquet(out).agg(org.apache.spark.sql.functions.sum("id"))
      .collect().head.getLong(0) == 6400L * 6399L / 2)
  }

  test("planCompaction: byte-budgeted bins in listing order, giant files " +
    "claim multiple budgets") {
    import spark.implicits._
    val files = Seq( // listing order == name order
      ("f01", 60L), ("f02", 60L), // bin 0: 120 B before f03
      ("f03", 500L),              // bin 1: giant file -> skips budgets
      ("f04", 10L)                // before=620 -> bin 6
    ).toDF("file", "bytes")
    val plan = Layout.planCompaction(files, targetBytes = 100L)
      .orderBy("file").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))) // (file, bytes, bin)
    val bins = plan.map { case (f, _, b) => f -> b }.toMap
    assert(bins("f01") === 0L && bins("f02") === 0L)
    assert(bins("f03") === 1L)
    assert(bins("f04") === 6L) // 620 bytes before it / 100 -> bin 6
    // bin is monotone in listing order
    assert(plan.sortBy(_._1).map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true })
  }

  test("compaction can also SPLIT: more files than read partitions") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-split").toString
    val in = s"$base/in"
    val out = s"$base/out"
    (0L until 6400L).toDF("id").coalesce(1).write.parquet(in) // one file
    val target = math.max(1L, Layout.datasetBytes(spark, in) / 4)
    val n = Layout.compact(spark, in, out, targetFileBytes = target)
    val files = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n >= 4 && files == n, s"returned $n, wrote $files") // coalesce alone could not
    assert(spark.read.parquet(out).count() == 6400)
  }

  test("z-order: thin-slab queries on EITHER dimension skip most partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 100×100 uniform grid; 16 output partitions. A linear sort on x
    // gives every partition the full y range — a y-slab query overlaps
    // ALL of them; z-order keeps per-partition ranges tight in both
    // dimensions, so min/max stats prune most partitions for both axes.
    // hash-repartition the input so its splits (and therefore the range
    // sampler's boundaries) don't depend on how many suites run in
    // parallel — parallelize's default splits follow live thread counts
    val pts = (for (x <- 0 until 100; y <- 0 until 100)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .repartition(8, col("x"), col("y"))
    def boxes(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def overlapping(bx: Array[(Long, Long, Long, Long)],
        xr: (Long, Long), yr: (Long, Long)): Int =
      bx.count { case (x0, x1, y0, y1) =>
        x1 >= xr._1 && x0 <= xr._2 && y1 >= yr._1 && y0 <= yr._2 }
    val z = boxes(Layout.zorderBy(pts, "x", "y", numPartitions = 16))
    val linear = boxes(pts.repartitionByRange(16, col("x")))
    assert(z.length == 16 && linear.length == 16)
    val ySlab = ((0L, 99L), (40L, 49L)) // all x, thin y band
    val xSlab = ((40L, 49L), (0L, 99L)) // thin x band, all y
    // linear-by-x: every partition spans all of y → zero pruning on y
    assert(overlapping(linear, ySlab._1, ySlab._2) == 16)
    // z-order: a 10-wide band on either axis touches well under all 16
    // partitions (ideal 4×4 cells ⇒ 4-8; sampling jitter can clip one
    // extra cell row, hence ≤ 10 — the property is "prunes on BOTH axes",
    // vs linear's 16/16 on y)
    assert(overlapping(z, ySlab._1, ySlab._2) <= 10,
      z.mkString("; "))
    assert(overlapping(z, xSlab._1, xSlab._2) <= 10,
      z.mkString("; "))
    // and the clustering lost no rows
    assert(Layout.zorderBy(pts, "x", "y", 16).count() == 10000)
  }

  test("date partitioning: range scan prunes to the selected directories") {
    val path = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/events"
    val events = Tables.events(spark, "/root/testdata/sf0.001") // 30 days of data
    Layout.writeDatePartitioned(events, "ts", path)

    val all = spark.read.parquet(path)
    assert(Layout.partitionsScanned(all) == 30)

    val week = Layout.readDateRange(spark, path, "2024-01-08", "2024-01-14")
    assert(week.count() > 0)
    assert(Layout.partitionsScanned(week) == 7) // pruned at planning time
    // and the partition filter is NOT a row-level data filter
    val scanStr = week.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters"), scanStr)
  }
}
