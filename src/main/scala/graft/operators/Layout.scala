package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers: directory partitioning for partition pruning.
  *
  * Time-grained data (events, reviews) written `partitionBy(date)` lets any
  * date-ranged query skip whole directories at planning time — at 100 TB a
  * "last 7 days" query scans days, not years. The complement to
  * [[Bucketing]] (which co-locates join keys): partitioning prunes scans,
  * bucketing deletes join shuffles; a table can do both.
  *
  * Cardinality rule: partition columns must be low-cardinality (dates,
  * regions) — partitioning by a key like user_id creates millions of tiny
  * files and kills the file index.
  */
object Layout {

  /** Write `df` date-partitioned on `to_date(tsCol)`. */
  def writeDatePartitioned(
      df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

  /** Scan restricted to [from, to] — the filter lands in PartitionFilters,
    * not the row-level data filters.
    */
  def readDateRange(
      spark: SparkSession, path: String, from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("p_date") >= lit(from) && col("p_date") <= lit(to))

  /** Count of partition directories the plan actually reads — assert this
    * shrinks under a date filter to prove pruning.
    */
  def partitionsScanned(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    PlanWalk.collectPlan(df.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }.map(_.selectedPartitions.partitionCount.toLong).sum
  }
}
