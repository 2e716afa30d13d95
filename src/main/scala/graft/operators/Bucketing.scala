package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * A fact table that is repeatedly joined on the same key (the unified
  * join's `user_id`/`business_id`, `orders.o_custkey`, ...) should be
  * written bucketed on that key: both sides of a same-bucketing join are
  * already hash-partitioned on disk, so the sort-merge join runs with NO
  * Exchange — at 100 TB that deletes the dominant cost of every recurring
  * join. This is the static counterpart of AQE's runtime optimizations:
  * AQE can shrink or re-plan a shuffle, only bucketing removes it.
  *
  * Bucketed writes go through the session catalog (`saveAsTable`) —
  * bucketing metadata lives in the catalog, not the parquet files.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table. `buckets` should divide evenly
    * into the cluster's usable parallelism; sorting within buckets makes
    * the downstream SMJ's sort a no-op too.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key. With equal
    * bucket counts this plans as an Exchange-free sort-merge join (assert
    * with [[numShuffles]]).
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** Number of shuffle Exchange operators in the EXECUTED plan — 0 proves
    * co-location. Materializes the frame's own QueryExecution first (an API
    * action like `count()` builds a derived plan, leaving this one's AQE
    * plan un-finalized) and walks through the adaptive wrappers via
    * [[PlanWalk]].
    */
  def numShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    PlanWalk.collectPlan(PlanWalk.executedPlanOf(df)) {
      case e: ShuffleExchangeLike => e
    }.size
  }
}
