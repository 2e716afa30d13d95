package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** General MERGE INTO semantics (the Delta/Iceberg upsert contract) as a
  * single-join batch operator: a change batch with per-row actions is
  * applied to a base table —
  *
  *   matched  + upsert → UPDATE (changed payload wins)
  *   matched  + delete → row removed
  *   unmatched + upsert → INSERT
  *   unmatched + delete → no-op
  *   base only          → row kept
  *
  * Generalizes the engine's idempotent-upsert tier (D1,
  * `dedup.Dedup.exactKeepRows`) and the SCD2 history builder
  * ([[TimeSeries]]) to arbitrary matched/not-matched actions — the write
  * path every incremental pipeline ends in, minus the table-format
  * transaction log (out of scope by the no-new-deps constraint, and
  * orthogonal: the transactional formats run exactly this join).
  *
  * 100 TB shape: ONE full-outer join keyed on the merge key — both sides
  * shuffle once on the 8-byte key; the action dispatch is a per-row CASE
  * with no further exchange. The provenance column (`op`) is free — it
  * falls out of the join sides. A real lakehouse MERGE adds file pruning
  * on top; the join core is identical.
  */
object MergeInto {

  /** @param base    (key, payload...) current table
    * @param changes (key, payload..., action) with action ∈ {upsert, delete}
    *                — any other value (including null) RAISES at execution
    *                time: the CASE used to fall through to delete, which
    *                turned a typo'd "update" into silent row loss on a
    *                durable write path (transactional MERGE engines reject
    *                an unmatched WHEN clause the same way)
    * @param key     join column name — assumed UNIQUE on both sides, the
    *                same precondition transactional MERGE enforces (Delta
    *                throws on multiple matches; here duplicate keys would
    *                fan out through the join instead)
    * @param payload payload column names (changed side wins on upsert)
    */
  def merge(base: DataFrame, changes: DataFrame, key: String,
            payload: Seq[String]): DataFrame = {
    val b = base.select((key +: payload).map(c => col(c).as(s"b_$c")): _*)
    val c = changes.select(
      (((key +: payload).map(cn => col(cn).as(s"c_$cn"))) :+ col("action")): _*)
    b.join(c, col(s"b_$key") === col(s"c_$key"), "full_outer")
      .withColumn("op",
        when(col(s"c_$key").isNotNull &&
            (col("action").isNull || !col("action").isin("upsert", "delete")),
          raise_error(format_string(
            "MergeInto: unrecognized action '%s' for key '%s' (expected upsert|delete)",
            col("action"), col(s"c_$key").cast("string"))))
          .when(col(s"b_$key").isNotNull && col("action").isNull, "kept")
          .when(col(s"b_$key").isNotNull && col("action") === "upsert", "updated")
          .when(col(s"b_$key").isNull && col("action") === "upsert", "inserted")
          .otherwise("deleted"))
      .filter(col("op") =!= "deleted")
      .select(
        (coalesce(col(s"b_$key"), col(s"c_$key")).as(key) +:
          payload.map(p =>
            when(col("op") === "kept", col(s"b_$p"))
              .otherwise(col(s"c_$p")).as(p))) :+ col("op"): _*)
  }

  /** q127: a deterministic change batch derived from the orders table —
    * every 5th order is touched (key%3==0 deleted, others repriced),
    * plus shifted-key rows that can only insert.
    */
  def ordersMergeQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val base = orders.select(col("o_orderkey"), col("o_totalprice"))
    val touched = orders.filter(col("o_orderkey") % 5 === 0)
    val updates = touched.select(
      col("o_orderkey"),
      round(col("o_totalprice") + 100.0, 2).as("o_totalprice"),
      when(col("o_orderkey") % 3 === 0, "delete").otherwise("upsert")
        .as("action"))
    // NOTE: the insert payload carries the price UNCHANGED — a derived
    // price like x/2 lands on exact .xx5 decimal ties, where Spark
    // (BigDecimal.valueOf, shortest-string) and DuckDB (binary scaling)
    // legitimately round differently; +100 on a 2-dp value is tie-free
    val inserts = touched.select(
      (col("o_orderkey") + 100000000L).as("o_orderkey"),
      col("o_totalprice"),
      lit("upsert").as("action"))
    merge(base, updates.unionAll(inserts), "o_orderkey", Seq("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
}
