package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Join-key skew diagnostic — the report you run BEFORE deciding whether a
  * join needs salting ([[graft.operators.SkewJoin]]), AQE skew handling,
  * or a broadcast: per-key row counts reduced to the numbers that matter
  * at planning time (max/avg skew factor, heavy-key census). At 100 TB a
  * single hot key turns a 1000-executor shuffle into a 1-task straggler;
  * this quantifies that risk per candidate key column.
  *
  * Reference tie: the profiling row of the reference's quality surface
  * (`Data_Quality.py`'s per-column null/distinct profiling), extended
  * from null-ness to key-distribution shape.
  *
  * 100 TB shape: per key column the plan is two partial-aggregated
  * passes — rows → (key, cnt) keyed on the key, then (key, cnt) → one
  * summary row — plus a broadcast of the 1-row average for the heavy-key
  * census; nothing ever sorts or windows the count table. Ratios compare
  * on round(·, 4).
  */
object SkewReport {

  /** One summary row for a key column: (rel, n_rows, n_keys,
    * avg_per_key, max_per_key, skew_factor, n_keys_over_10x).
    */
  def keyReport(df: DataFrame, rel: String, key: String): DataFrame = {
    val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_per_key"))
    counts
      .crossJoin(broadcast(totals))
      .withColumn("avg_per_key",
        round(col("n_rows").cast("double") / col("n_keys"), 4))
      .groupBy(col("n_rows"), col("n_keys"), col("avg_per_key"),
        col("max_per_key"))
      .agg(sum(when(col("cnt").cast("double") > col("avg_per_key") * 10.0, 1L)
        .otherwise(0L)).as("n_keys_over_10x"))
      .select(lit(rel).as("rel"), col("n_rows"), col("n_keys"),
        col("avg_per_key"), col("max_per_key"),
        round(col("max_per_key").cast("double")
          / (col("n_rows").cast("double") / col("n_keys")), 4).as("skew_factor"),
        col("n_keys_over_10x"))
  }

  /** The standard testdata join keys, one report row each. */
  def joinKeysQuery(s: SparkSession, dir: String): DataFrame =
    keyReport(Tables.orders(s, dir), "orders.o_custkey", "o_custkey")
      .unionAll(keyReport(Tables.lineitem(s, dir), "lineitem.l_partkey", "l_partkey"))
      .unionAll(keyReport(Tables.events(s, dir), "events.user_id", "user_id"))
      .orderBy(col("rel"))
}
