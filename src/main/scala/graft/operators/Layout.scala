package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** Interleave the low 16 bits of `x` with zeros (Morton "part1by1") via
    * the 4-step magic-mask spread — pure column arithmetic, stays inside
    * whole-stage codegen.
    */
  private def part1by1(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (Z-order) code from two 16-bit grid coordinates. */
  def mortonCode(gx: Column, gy: Column): Column =
    part1by1(gx).bitwiseOR(shiftleft(part1by1(gy), 1))

  /** Z-order clustering on two numeric columns — the OPTIMIZE ZORDER
    * layout pattern (Delta/Iceberg) as plain Spark: each column is
    * min/max-normalized onto a 16-bit grid (one 1-row aggregate,
    * broadcast — no global sort for the normalization), the grid cells
    * interleave into a Morton code, and the data is range-partitioned +
    * sorted by that code. Rows close in BOTH dimensions land in the same
    * output partition/file, so parquet min/max stats prune 2-D range
    * predicates — a linear sort on one column leaves the other column's
    * per-file range at full width and prunes nothing for it (LayoutSpec
    * measures exactly this).
    *
    * Skew note: min/max normalization collapses under heavy-tailed
    * columns; pre-transform (log, clamp) or rank via approx quantiles
    * before z-ordering such data.
    */
  def zorderBy(df: DataFrame, c1: String, c2: String,
      numPartitions: Int): DataFrame = {
    val grid = 65535L
    def cell(c: String, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        least(floor((col(c) - mn) / (mx - mn) * lit(grid + 1)), lit(grid))
          .cast("long"))
    val stats = df.agg(
      min(col(c1)).as("__mn1"), max(col(c1)).as("__mx1"),
      min(col(c2)).as("__mn2"), max(col(c2)).as("__mx2"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", mortonCode(
        cell(c1, col("__mn1"), col("__mx1")),
        cell(c2, col("__mn2"), col("__mx2"))))
      .drop("__mn1", "__mx1", "__mn2", "__mx2")
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
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
    // the usual compaction direction still takes the shuffle-free path).
    // `src.rdd.getNumPartitions` instantiates the RDD lineage to read the
    // scan's partition count — a PLANNING-time cost only (no job runs);
    // don't "optimize" it away with a byte-based estimate, which would
    // break the coalesce-vs-repartition decision whenever
    // maxPartitionBytes packing diverges from file sizes.
    val sized =
      if (nFiles <= src.rdd.getNumPartitions) src.coalesce(nFiles)
      else src.repartition(nFiles)
    sized.write.mode("overwrite").parquet(outPath)
    nFiles.toLong
  }

  /** Compaction PLAN as data: assign an ordered file listing
    * `(file, bytes)` to output bins of ≈ `targetBytes` by running byte
    * total — bin = floor(bytes-before-this-file / target), so every bin
    * except possibly the last holds at least `targetBytes` once its
    * first file lands and files stay in listing order (rewrites remain
    * sequential reads of neighboring inputs).
    *
    * Scale note: the global ORDER BY window is a deliberate choice —
    * the input is file METADATA (name + size), ~1M rows per 100 TB of
    * 100 MB files, not data. A running sum over that is a single-task
    * window on megabytes; sharding it two-phase would buy nothing.
    */
  def planCompaction(files: DataFrame, targetBytes: Long): DataFrame = {
    val w = Window.orderBy(col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", floor(col("__before") / lit(targetBytes.toDouble)))
      .drop("__before")
  }

  /** q138: [[planCompaction]] over a deterministic synthetic listing —
    * lineitem rolled up into 400 "files" whose integer byte sizes come
    * from quantity/linenumber arithmetic (no float sums, so the oracle's
    * running totals match bit-for-bit). One row per output bin.
    */
  def compactionPlanQuery(s: SparkSession, dir: String): DataFrame = {
    val files = Tables.lineitem(s, dir)
      .groupBy(concat(lit("part-"),
        lpad((col("l_orderkey") % 400).cast("string"), 4, "0")).as("file"))
      .agg(sum(floor(col("l_quantity")) * lit(997L) +
        col("l_linenumber").cast("long")).as("bytes"))
    planCompaction(files, 50000000L)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("file")).as("first_file"), max(col("file")).as("last_file"))
      .orderBy(col("bin"))
  }

  /** q137: Z-order slab statistics — the driver-visible cut of
    * [[zorderBy]]'s Morton machinery. Grid cells come from pure integer
    * arithmetic (key mod 2^16, no min/max float normalization) so the
    * oracle can replay the magic-mask spread exactly; slab = the Morton
    * code's high bits, i.e. a 64×64-cell Z-curve region. The per-slab
    * min/max widths of BOTH dimensions are the quantity parquet min/max
    * pruning actually uses — the point of Z-ordering (a linear sort
    * leaves the second dimension's per-slab width at full range;
    * LayoutSpec measures that comparison).
    */
  def zorderSlabsQuery(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .select((col("l_partkey") % 65536L).as("gx"),
        (col("l_suppkey") % 65536L).as("gy"))
    g.withColumn("slab", shiftright(mortonCode(col("gx"), col("gy")), 12))
      .groupBy(col("slab"))
      .agg(count(lit(1)).as("n"),
        min(col("gx")).as("gx_min"), max(col("gx")).as("gx_max"),
        min(col("gy")).as("gy_min"), max(col("gy")).as("gy_max"))
      .orderBy(col("slab"))
  }
}
