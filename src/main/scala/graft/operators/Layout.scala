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

  /** Total on-disk bytes of a parquet dataset directory (driver-side file
    * listing — metadata only, no data read).
    */
  def datasetBytes(spark: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    bytes
  }

  /** Small-file compaction: rewrite a parquet dataset into files of about
    * `targetFileBytes` each, sized from the dataset's MEASURED bytes (row
    * counts say nothing about file size when row width varies 1000×). At
    * 100 TB a streaming sink's thousands of KB-sized files per day turn
    * every downstream scan into a file-listing storm; compaction restores
    * ~128 MB scan units. Uses coalesce (no shuffle) — output files track
    * input locality; pass a sort column first if clustering matters.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20): Long = {
    val bytes = datasetBytes(spark, inPath)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val src = spark.read.parquet(inPath)
    // coalesce can only DECREASE partition count — splitting fewer, larger
    // files into more, smaller ones needs a real repartition (one shuffle;
    // the usual compaction direction still takes the shuffle-free path)
    val sized =
      if (nFiles <= src.rdd.getNumPartitions) src.coalesce(nFiles)
      else src.repartition(nFiles)
    sized.write.mode("overwrite").parquet(outPath)
    nFiles.toLong
  }
}
