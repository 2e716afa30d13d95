package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: points (key, t) against intervals
  * (key, start, end), matching start ≤ t < end within the same key.
  *
  * Spark has no range-join operator — a raw
  * `points.join(intervals, key && start <= t && t < end)` plans the
  * inequality part as a post-filter on the key equi-join, which is fine
  * when keys are selective but degrades to a per-key cross product when a
  * key's point and interval counts are both large (the usual case for a
  * time axis keyed by, say, region).
  *
  * This operator buckets the time axis: each interval explodes into the
  * buckets it covers (≤ len/bucketWidth + 1 rows), each point maps to
  * exactly ONE bucket, and the join becomes a pure equi-join on
  * (key, bucket) followed by the exact range filter. Because the point
  * side contributes each row once, no dedup is needed. Choose bucketWidth
  * on the order of the typical interval length: explode factor stays
  * O(1) while each bucket's candidate set shrinks by the bucket count.
  *
  * Times are epoch seconds (cast timestamps with `.cast("long")`).
  */
object RangeJoin {

  /** @param points     (key, t, payload...) — `t` epoch seconds
    * @param intervals  (key, start, end, payload...) — epoch seconds,
    *                   start inclusive, end exclusive
    * @param key        equi-key column name on both sides
    * @param bucketWidth seconds per bucket
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, key: String,
      t: String, start: String, end: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = lit(bucketWidth)
    // end is exclusive: an interval ending exactly on a bucket boundary
    // does not reach into that bucket — hence the (end - 1) upper bucket.
    // Empty/inverted intervals (end <= start) match nothing by definition
    // and MUST be dropped first: Spark's sequence(lo, hi) is DESCENDING
    // when hi < lo, so one corrupt swapped-bounds row would otherwise
    // explode into |span|/bucketWidth shuffle rows.
    val iv = intervals.filter(col(end) > col(start))
      .withColumn("__bucket",
        explode(sequence(floor(col(start) / b).cast("long"),
          floor((col(end) - 1) / b).cast("long"))))
    val pt = points.withColumn("__bucket", floor(col(t) / b).cast("long"))
    pt.join(iv, Seq(key, "__bucket"))
      .filter(col(start) <= col(t) && col(t) < col(end))
      .drop("__bucket")
  }

  /** Interval-overlap join: (key, startA, endA) ⋈ (key, startB, endB) where
    * the half-open intervals intersect (startA < endB ∧ startB < endA)
    * within the same key. Same bucketing discipline as [[pointInInterval]],
    * but BOTH sides explode — so a pair sharing several buckets would emit
    * several times. Dedup is free: the overlap's first instant
    * max(startA, startB) lies in exactly one bucket that both intervals
    * cover, so keeping only `bucket == floor(max(start)/width)` emits each
    * pair exactly once — an equality filter, not a distinct shuffle.
    *
    * Column names must be disjoint across the two inputs (rename before
    * calling); empty/inverted intervals are dropped on both sides (the
    * descending-`sequence` guard, see [[pointInInterval]]).
    */
  def intervalOverlap(
      a: DataFrame, b: DataFrame, key: String,
      startA: String, endA: String, startB: String, endB: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    def exploded(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s))
        .withColumn("__bucket",
          explode(sequence(floor(col(s) / w).cast("long"),
            floor((col(e) - 1) / w).cast("long"))))
    exploded(a, startA, endA)
      .join(exploded(b, startB, endB), Seq(key, "__bucket"))
      .filter(col(startA) < col(endB) && col(startB) < col(endA))
      .filter(col("__bucket")
        === floor(greatest(col(startA), col(startB)) / w).cast("long"))
      .drop("__bucket")
  }

  /** q64: pairs of orders by the same customer whose 7-day activity
    * windows overlap — burst detection over the interval-overlap join
    * (the self-join flavor: same intervals on both sides, `key_a < key_b`
    * keeps each unordered pair once).
    */
  def overlappingOrdersQuery(s: SparkSession, dir: String): DataFrame = {
    val week = 7L * 86400L * 1000000L
    val base = graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("start"))
      .withColumn("end", col("start") + lit(week))
    val a = base.select(col("user_id"), col("o_orderkey").as("key_a"),
      col("start").as("start_a"), col("end").as("end_a"))
    val b = base.select(col("user_id"), col("o_orderkey").as("key_b"),
      col("start").as("start_b"), col("end").as("end_b"))
    intervalOverlap(a, b, "user_id", "start_a", "end_a", "start_b", "end_b",
        bucketWidth = week)
      .filter(col("key_a") < col("key_b"))
      .select(col("user_id"), col("key_a"), col("key_b"))
      .orderBy(col("user_id"), col("key_a"), col("key_b"))
  }

  /** q43: for each order, how many events the ordering customer produced in
    * the 7 days starting at the order date — the "activity after purchase"
    * interval join. Left semantics (orders with no events count 0).
    * Times at microsecond resolution (events carry sub-second parts;
    * truncating to seconds would disagree with the oracle's epoch_us).
    */
  def eventsAfterOrderQuery(s: SparkSession, dir: String): DataFrame = {
    val week = 7L * 86400L * 1000000L // micros
    val o = graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("start"))
      .withColumn("end", col("start") + lit(week))
    val e = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"))
    val matched = pointInInterval(e, o, "user_id", "t", "start", "end",
        bucketWidth = week)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_events"))
    o.select(col("o_orderkey"))
      .join(matched, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("o_orderkey"))
  }
}
