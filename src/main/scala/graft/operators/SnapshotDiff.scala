package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot diffing: classify every key across two versions of a table
  * as added / removed / changed / unchanged — the regression gate
  * between pipeline runs (did the new code change rows it shouldn't
  * have?) and the input to incremental downstream refresh.
  *
  * One full-outer equi-join on the key; payload comparison is a single
  * null-safe struct equality (`<=>`), so arbitrarily wide payloads cost
  * one codegen'd comparison and no per-column join conditions. At scale
  * this is the canonical "diff two snapshots" shuffle: both sides
  * hash-partition by key once.
  */
object SnapshotDiff {

  /** @param payloadCols columns whose change makes a row "changed";
    *                    everything else is ignored
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(keyCol).as("k"),
      struct(payloadCols.map(col): _*).as("old_p"))
    val n = newDf.select(col(keyCol).as("k"),
      struct(payloadCols.map(col): _*).as("new_p"))
    o.join(n, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("old_p").isNull, "added")
          .when(col("new_p").isNull, "removed")
          .when(col("old_p") <=> col("new_p"), "unchanged")
          .otherwise("changed"))
  }

  /** q104: diff a synthesized "previous run" of the orders table against
    * a synthesized "current run" — the previous run is missing recent
    * orders (adds), the current run drops every 89th key (removes) and
    * re-prices every 97th (changes). Both versions derive
    * deterministically from the same table, so the oracle can rebuild
    * them; the diff operator itself never knows that.
    */
  def ordersDiffQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val old = orders
      .filter(to_date(col("o_orderdate")) < lit("1998-06-01").cast("date"))
    val current = orders
      .filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 0, round(col("o_totalprice") + 1.0, 2))
          .otherwise(col("o_totalprice")))
    diff(old, current, "o_orderkey",
        Seq("o_totalprice", "o_orderstatus", "o_orderpriority"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }
}
