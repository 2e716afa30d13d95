package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-constraint suite (the Deequ/Great-Expectations shape):
  * a check is DATA — (name, violation counter) — and the report is one
  * row per check with its violation count and verdict. This generalizes
  * the reference's hand-rolled assertions (`Data_Quality.py`'s null/
  * uniqueness probes, `neo4j_test.cypher:39-44`'s consistency queries)
  * into a reusable operator.
  *
  * 100 TB shape: every check is either a single partial-aggregated pass
  * over the table (completeness / range / set membership — these FUSE
  * into ONE scan when they share a table) or a count over an anti-join
  * keyed on the constraint column (uniqueness = self-group HAVING,
  * referential = left-anti against the dimension); the report itself is
  * check-cardinality sized. No check ever sorts or windows the table.
  */
object Constraints {

  /** A named violation counter: `agg` must be an aggregate expression
    * counting violating rows.
    */
  final case class AggCheck(name: String, agg: Column)

  /** Aggregate-expressible checks evaluated in ONE scan of `df`. */
  def aggReport(df: DataFrame, checks: Seq[AggCheck]): DataFrame = {
    val first = checks.head
    df.agg(first.agg.as(first.name),
        checks.tail.map(c => c.agg.as(c.name)): _*)
      .select(array(checks.map(c =>
        struct(lit(c.name).as("constraint"),
          col(c.name).cast("long").as("n_violations"))): _*).as("cs"))
      .select(explode(col("cs")).as("c"))
      .select(col("c.constraint"), col("c.n_violations"))
  }

  def notNull(colName: String): AggCheck =
    AggCheck(s"not_null($colName)",
      sum(when(col(colName).isNull, 1L).otherwise(0L)))

  def inRange(colName: String, lo: Double, hi: Double): AggCheck =
    AggCheck(s"in_range($colName)",
      sum(when(col(colName) < lo || col(colName) > hi, 1L).otherwise(0L)))

  def acceptedValues(colName: String, allowed: Seq[String]): AggCheck =
    AggCheck(s"accepted_values($colName)",
      sum(when(!col(colName).isin(allowed: _*), 1L).otherwise(0L)))

  /** Duplicate-key rows beyond the first occurrence of each key. */
  def uniqueViolations(df: DataFrame, colName: String): DataFrame = {
    val n = df.groupBy(col(colName))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1L)
      .agg(coalesce(sum(col("c") - 1L), lit(0L)).as("n_violations"))
    n.select(lit(s"unique($colName)").as("constraint"), col("n_violations"))
  }

  /** Foreign-key rows whose key has no match in `dim.dimCol`. */
  def refViolations(fact: DataFrame, factCol: String,
                    dim: DataFrame, dimCol: String): DataFrame =
    fact.select(col(factCol))
      .join(dim.select(col(dimCol).as(factCol)), Seq(factCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"ref($factCol->$dimCol)").as("constraint"),
        col("n_violations"))

  /** q124: the orders-table contract — fused single-scan aggregate checks
    * plus the two keyed checks, one verdict row per constraint.
    */
  def ordersContractQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val scanChecks = aggReport(orders, Seq(
      notNull("o_custkey"),
      notNull("o_orderdate"),
      inRange("o_totalprice", 0.0, 450000.0),
      acceptedValues("o_orderstatus", Seq("F", "O", "P"))))
    scanChecks
      .unionAll(uniqueViolations(orders, "o_orderkey"))
      .unionAll(refViolations(orders, "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("constraint"))
  }
}
