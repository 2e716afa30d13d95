package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact global order statistics WITHOUT a global sort — the bucket-offset
  * construction (the q98 Gini / q100 packing pattern, applied to quantile
  * selection): histogram the value space into fixed-width buckets, prefix-
  * sum the dimension-sized histogram to locate the bucket holding each
  * target rank, then rank ONLY the selected buckets' rows. Complements
  * q35's `percentile` (exact but per-group full-sort semantics) and q31's
  * `approx_percentile`: exact answers at corpus scale with narrow passes
  * and no partition ever holding more than one (refined) bucket's rows.
  *
  * Reference tie: the reference's dashboard percentile rollups
  * (README.md's analytics layer) — re-expressed so the exactness survives
  * a 100 TB table.
  *
  * 100 TB shape: pass 1 partial-aggregates bucket counts map-side (the
  * exchange carries one row per bucket); the histogram prefix-sum window
  * runs on the dimension-sized bucket table (≤ range/width rows — the
  * documented tiny-table window exception); pass 2 scans only the buckets
  * that contain a target rank (a broadcast semi-join prune) and ranks
  * within them. Rank arithmetic (`ceil(q·n)`) happens on bit-identical
  * doubles in both engines, so the selected index is exact — no rounding
  * anywhere in the answer path.
  *
  * Adversarial safety (two mechanisms, so a pathological value
  * distribution cannot degrade pass 2 into a near-global sort):
  *
  *  1. ADAPTIVE REFINEMENT — any bucket whose count exceeds
  *     `maxBucketRows` is re-bucketed once with a per-bucket finer width
  *     `bucketWidth / ceil(c / maxBucketRows)` (fanout capped at 4096),
  *     so a bucket holding 99% of the mass splits into sub-buckets of
  *     ~`maxBucketRows` rows each. The refinement table is
  *     dimension-sized and rides a broadcast join; the unit key becomes
  *     (bucket, sub-bucket) everywhere downstream.
  *  2. VALUE COLLAPSE — pass 2 ranks DISTINCT values (a (q, value)
  *     partial-aggregated count, then a cumulative sum over the selected
  *     slice's distinct values), not rows. A million-fold repeated value
  *     — which no value-range split can separate — collapses to one row
  *     before the rank window, and the window's partition is bounded by
  *     the number of distinct values in one refined bucket.
  *
  * Residual bound: distinct-value mass packed inside one sub-bucket's
  * range can still exceed `maxBucketRows` (refinement is one level, per
  * the single-recursion design); the fanout cap makes that window
  * `maxBucketRows`·4096-ths of such a cluster, never the full column.
  *
  * Broadcast discipline: explicit `broadcast(...)` hints appear ONLY on
  * tables bounded by |qs| (the targets / selected-slice descriptors —
  * a handful of rows by construction). The histogram-derived tables
  * (refinement fanouts, per-group slice selections) are occupied-bucket-
  * sized — usually tiny, but an adversarial wide-range distribution can
  * push them to ~n rows — so they ride unhinted joins and let AQE pick
  * broadcast-hash from RUNTIME sizes, degrading to a shuffle join past
  * the threshold instead of failing the query on a driver OOM.
  */
object Quantiles {

  /** Fanout cap for one refinement level — bounds the broadcast
    * refinement table and the sub-bucket key space. */
  private val MaxRefine = 4096L

  /** Sub-bucket of `v` within bucket `b`: splits [b·W, (b+1)·W) into `r`
    * equal ranges, clamped against fp edge drift at the boundaries. */
  private def subBucket(v: Column, b: Column, r: Column, width: Double): Column =
    greatest(lit(0L), least(r - 1L,
      floor((v - b * width) * r / width).cast("long")))

  /** The refined (v, b, s) row set behind [[globalQuantiles]]: fixed-width
    * buckets, then a one-level adaptive split of oversized buckets via a
    * broadcast dimension-sized refinement table. Package-visible so the
    * spec can assert the slice-size bound on the production path.
    */
  private[analytics] def refinedBuckets(df: DataFrame, valueCol: String,
      bucketWidth: Double, maxBucketRows: Long): DataFrame = {
    val bucketed0 = df.select(
      col(valueCol).cast("double").as("v"),
      floor(col(valueCol) / bucketWidth).cast("long").as("b"))
    val hist0 = bucketed0.groupBy(col("b")).agg(count(lit(1)).as("c0"))
    // dimension-sized per-bucket refinement fanout (1 = not oversized)
    val refine = hist0.select(col("b"),
      when(col("c0") > maxBucketRows,
        least(ceil(col("c0") / maxBucketRows).cast("long"), lit(MaxRefine)))
        .otherwise(lit(1L)).as("r"))
    bucketed0.join(refine, Seq("b")) // AQE-sized: see broadcast discipline
      .withColumn("s", subBucket(col("v"), col("b"), col("r"), bucketWidth))
      .select(col("v"), col("b"), col("s"))
  }

  /** Nearest-rank quantiles of `valueCol`: value with 1-based rank
    * ceil(q·n) in sorted order. Returns (q, value) rows.
    *
    * @param maxBucketRows refinement threshold: buckets above this count
    *   are split (see the class doc). The default keeps pass-2 partitions
    *   comfortably in one executor's memory at ~16 bytes/row.
    */
  def globalQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                      bucketWidth: Double,
                      maxBucketRows: Long = 1L << 22): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed = refinedBuckets(df, valueCol, bucketWidth, maxBucketRows)
    val hist = bucketed.groupBy(col("b"), col("s")).agg(count(lit(1)).as("c"))
    // dimension-sized prefix table: one row per occupied (sub-)bucket
    val pref = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(
        Window.orderBy(col("b"), col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val total = hist.agg(sum(col("c")).as("n"))
    val targets = qs.toDF("q")
      .crossJoin(broadcast(total))
      .withColumn("k", ceil(col("q") * col("n")))
    // non-equi join: broadcast the |qs|-row TARGETS side (provably tiny),
    // streaming the occupied-bucket-sized prefix table — never the reverse
    val sel = broadcast(targets).join(pref,
        col("k") > col("cum_before") && col("k") <= col("cum_before") + col("c"))
      .select(col("q"), col("k"), col("b"), col("s"), col("cum_before"))
    // pass 2: rank DISTINCT values of the selected slice (value collapse)
    bucketed
      .join(broadcast(sel), Seq("b", "s"))
      .groupBy(col("q"), col("k"), col("cum_before"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_v",
        sum(col("cnt")).over(Window.partitionBy(col("q")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("k") - col("cum_before") > col("cum_v") - col("cnt") &&
        col("k") - col("cum_before") <= col("cum_v"))
      .select(col("q"), col("v").as("value"))
      .orderBy(col("q"))
  }

  def priceQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    globalQuantiles(Tables.lineitem(s, dir), "l_extendedprice",
      Seq(0.25, 0.5, 0.75, 0.9, 0.99), bucketWidth = 1024.0)

  /** Per-group nearest-rank quantiles — the grouped form dashboards ask
    * for ("p50/p90 spend per priority"), same passes as
    * [[globalQuantiles]] with the group key threaded through every unit:
    * the histogram carries one row per (group, occupied bucket); its
    * prefix window partitions by GROUP (so no global sort even on the
    * tiny table); refinement fanout is per (group, bucket); pass 2 ranks
    * only the (group, bucket) slices that hold a target rank, collapsed
    * to distinct values. No per-group full sort ever happens — the q35
    * `percentile` semantics at corpus scale.
    */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       qs: Seq[Double], bucketWidth: Double,
                       maxBucketRows: Long = 1L << 22): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed0 = df.select(
      col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"),
      floor(col(valueCol) / bucketWidth).cast("long").as("b"))
    val hist0 = bucketed0.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c0"))
    val refine = hist0.select(col("g"), col("b"),
      when(col("c0") > maxBucketRows,
        least(ceil(col("c0") / maxBucketRows).cast("long"), lit(MaxRefine)))
        .otherwise(lit(1L)).as("r"))
    val bucketed = bucketed0.join(refine, Seq("g", "b")) // AQE-sized
      .withColumn("s", subBucket(col("v"), col("b"), col("r"), bucketWidth))
    val hist = bucketed.groupBy(col("g"), col("b"), col("s"))
      .agg(count(lit(1)).as("c"))
    val pref = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(
        Window.partitionBy(col("g")).orderBy(col("b"), col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = hist.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val targets = totals.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("k", ceil(col("q") * col("n")))
    val sel = targets.as("t").join(pref.as("p"),
        col("t.g") === col("p.g") &&
          col("k") > col("cum_before") && col("k") <= col("cum_before") + col("c"))
      .select(col("t.g").as("g"), col("q"), col("k"), col("b"), col("s"),
        col("cum_before"))
    bucketed
      .join(sel, Seq("g", "b", "s")) // |g|·|qs| rows — AQE-sized
      .groupBy(col("g"), col("q"), col("k"), col("cum_before"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_v",
        sum(col("cnt")).over(
          Window.partitionBy(col("g"), col("q")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("k") - col("cum_before") > col("cum_v") - col("cnt") &&
        col("k") - col("cum_before") <= col("cum_v"))
      .select(col("g").as(groupCol), col("q"), col("v").as("value"))
      .orderBy(col(groupCol), col("q"))
  }

  /** q130: spend quantiles per order priority. */
  def priorityQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    groupedQuantiles(Tables.orders(s, dir), "o_orderpriority", "o_totalprice",
      Seq(0.25, 0.5, 0.75, 0.9), bucketWidth = 1024.0)
}
