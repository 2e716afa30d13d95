package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Right-to-erasure cascade planning — given a set of subject keys to
  * forget, compute which rows die in every downstream table and what
  * the deletion COSTS at the file grain: copy-on-write storage (plain
  * parquet, Delta/Iceberg without deletion vectors) deletes a row by
  * rewriting its whole file, so the operative planning number is not
  * "how many rows" but "how many files, and how full of survivors" —
  * the rewrite-amplification profile. A 100 TB deployment runs exactly
  * this query before every GDPR/CCPA erasure batch to decide
  * rewrite-now vs deletion-vector-now-compact-later.
  *
  * Construction: the forget set cascades customer → orders (custkey
  * equi-join) → lineitem (orderkey equi-join) — the reference's
  * user → review → business foreign-key chain walked destructively
  * instead of analytically. Files are the q144 range-binned grain
  * (clustering key div span, span = ⌈(max+1)/NFiles⌉ — one broadcast
  * scalar per table). Per table, ONE scan computes both per-file totals
  * and per-file casualties: the cascade set rides a left join whose
  * probe side is key-unique (no row multiplication), and a conditional
  * count splits deleted from surviving rows in the same aggregate.
  *
  * Output: one row per AFFECTED (table, file): rows to delete, rows in
  * the file, and the rewrite percentage — `n_delete` of `n_file_rows`
  * forces a rewrite of the remaining `n_file_rows - n_delete` rows.
  * Low percentages are the pathological case (a whole file rewritten
  * to drop a handful of rows) — surfacing them IS the point.
  */
object ForgetPlan {

  val NFiles = 64
  val ForgetMod = 97

  /** The cascade plan over (keys: one column `k`), orders, lineitem. */
  def cascadePlan(forgetKeys: DataFrame, orders: DataFrame,
                  lineitem: DataFrame): DataFrame = {
    val fk = forgetKeys.select(col("k")).distinct()
    def filed(df: DataFrame, key: String): DataFrame = {
      val span = df.agg(
        (ceil((max(col(key)) + 1) / lit(NFiles.toDouble)))
          .cast("long").as("span"))
      df.crossJoin(broadcast(span))
        .withColumn("file_id", expr(s"$key div span"))
    }
    val o = filed(orders.select(col("o_orderkey"), col("o_custkey")),
      "o_orderkey")
    val oPlan = o.join(fk, col("o_custkey") === col("k"), "left")
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_file_rows"), count(col("k")).as("n_delete"))
      .withColumn("table_name", lit("orders"))
    // the cascade frontier: orderkeys dying with their customers
    // (key-unique — orders are unique per orderkey)
    val aff = o.join(fk, col("o_custkey") === col("k"))
      .select(col("o_orderkey").as("dead_ok"))
    val l = filed(lineitem.select(col("l_orderkey")), "l_orderkey")
    val lPlan = l.join(aff, col("l_orderkey") === col("dead_ok"), "left")
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_file_rows"),
        count(col("dead_ok")).as("n_delete"))
      .withColumn("table_name", lit("lineitem"))
    oPlan.unionByName(lPlan)
      .filter(col("n_delete") > 0)
      .select(col("table_name"), col("file_id"), col("n_delete"),
        col("n_file_rows"),
        round(col("n_delete") * 100.0 / col("n_file_rows"), 4)
          .as("pct_rewrite"))
      .orderBy(col("table_name"), col("file_id"))
  }

  /** q173: forget every customer with c_custkey ≡ 0 (mod 97). */
  def forgetPlanQuery(s: SparkSession, dir: String): DataFrame =
    cascadePlan(
      Tables.customer(s, dir).filter(col("c_custkey") % ForgetMod === 0)
        .select(col("c_custkey").as("k")),
      Tables.orders(s, dir), Tables.lineitem(s, dir))
}
