package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Equi-depth range-partition planning — EXACT balanced boundaries for a
  * sort/write key, the layout decision a 100 TB writer makes before
  * `repartitionByRange`/bucketed-write commits to it. Spark's own
  * RangePartitioner answers this with reservoir SAMPLES (approximate,
  * nondeterministic); this operator computes the exact quantile
  * boundaries b_i = min{v : cum(v) ≥ ⌈i·n/B⌉} plus the balance the plan
  * actually achieves — per-bucket row counts and their skew vs ideal —
  * so a hot boundary (a duplicate-heavy key value that swallows several
  * ranks and EMPTIES neighboring buckets) is visible before the shuffle
  * that would materialize it, not after.
  *
  * Reference tie: the reference stores its serving tables unpartitioned
  * behind Athena (`README.md` storage discussion); this is the planning
  * step that decision grows into at any real scale.
  *
  * 100 TB shape: the cumulative count is a PREFIX SUM built without a
  * single-partition window (the Packing/Gini idiom): value-grain counts
  * land in coarse monotone buckets (`floor(v / coarseWidth)`), each
  * bucket's base offset comes from the bucket-grain prefix table
  * (dimension-sized, broadcast), and the within-bucket running sum rides
  * a bucket-keyed window. Ranks (B−1 rows) broadcast against the
  * value-grain table; every downstream join is bounded by B or the
  * value domain, never the corpus.
  */
object PartitionPlanner {

  /** Exact equi-depth plan for `key` over `df`.
    *
    * @param buckets     target partition count B.
    * @param coarseWidth width of the monotone coarse buckets the prefix
    *                    sum rides (load-balance knob only;
    *                    result-invariant).
    * @return one row per bucket 0..B−1: `upper_bound` (the boundary
    *         b_{i+1}; null for the last bucket), `n_rows` (0 for buckets
    *         emptied by a duplicate-heavy boundary value), and
    *         `pct_rows` (share of the corpus, round 4). Bucket i covers
    *         (b_i, b_{i+1}]: rows equal to a boundary sort below it, so
    *         duplicates of one value always land together.
    */
  def equiDepth(df: DataFrame, key: Column, buckets: Int,
                coarseWidth: Double): DataFrame = {
    val s = df.sparkSession
    val counts = df.select(key.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .withColumn("b", floor(col("v") / lit(coarseWidth)).cast("long"))
    val prefix = counts.groupBy(col("b")).agg(sum(col("n")).as("t"))
      .withColumn("base",
        coalesce(sum(col("t")).over(
          Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("base")) // bucket-grain: broadcast
    val inB = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum_local", sum(col("n")).over(inB))
      .join(broadcast(prefix), "b")
      .select(col("v"), col("n"),
        (col("base") + col("cum_local")).as("cum"))
    val total = counts.agg(sum(col("n")).as("tot"))
    // ranks r_i = ⌈i·n/B⌉ in exact integer arithmetic; each rank is
    // covered by exactly ONE value row (cum intervals partition [1, n])
    val ranks = s.range(1, buckets.toLong)
      .select(col("id").as("i")).crossJoin(broadcast(total))
      .select(col("i"),
        expr(s"(i * tot + ${buckets - 1}) DIV $buckets").as("r"))
    val bounds = cum.join(broadcast(ranks),
        col("cum") - col("n") < col("r") && col("cum") >= col("r"))
      .select(col("i"), col("v").as("bound"))
    // assignment at value grain: bucket(v) = #{boundaries < v}
    val assigned = cum.crossJoin(broadcast(bounds.select(col("bound"))))
      .groupBy(col("v"), col("n"))
      .agg(sum(when(col("bound") < col("v"), 1L).otherwise(0L)).as("bucket_id"))
      .groupBy(col("bucket_id")).agg(sum(col("n")).as("n_rows"))
    s.range(buckets.toLong).select(col("id").as("bucket_id"))
      .join(bounds.select((col("i") - 1L).as("bucket_id"),
        col("bound").as("upper_bound")), Seq("bucket_id"), "left")
      .join(assigned, Seq("bucket_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket_id"), col("upper_bound"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        round(coalesce(col("n_rows"), lit(0L)) * 100.0 / col("tot"), 4)
          .as("pct_rows"))
      .orderBy(col("bucket_id"))
  }

  /** q169: the 16-way equi-depth plan for orders on o_totalprice. */
  def equiDepthQuery(s: SparkSession, dir: String): DataFrame =
    equiDepth(Tables.orders(s, dir), col("o_totalprice"), buckets = 16,
      coarseWidth = 4096.0)
}
