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
