package graft.operators

import graft.SparkSpec
import graft.Tables

class LayoutSpec extends SparkSpec {

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
