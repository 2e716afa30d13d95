package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** k-anonymity / l-diversity audit [Sweeney, "k-Anonymity: A Model for
  * Protecting Privacy", 2002; Machanavajjhala et al., "l-Diversity",
  * 2007]: before a dataset leaves the platform, group it by its
  * QUASI-IDENTIFIER columns and measure (a) how many rows sit in
  * equivalence classes smaller than k — the re-identifiable tail — and
  * (b) the distinct-l diversity of the sensitive column per class — a
  * class can be large yet leak exactly one sensitive value. This is
  * the release-side complement of q174's contribution capping (which
  * bounds sensitivity going INTO an aggregate) and q173's erasure
  * planner (which removes identified subjects).
  *
  * Exactness: everything is integer counts and one final exact-ratio
  * double per row; the report is one row per k-threshold in a fixed
  * ladder, so output size is constant.
  *
  * 100 TB shape: ONE corpus exchange to the QI-class grain (partial-
  * aggregated: count + sensitive-distinct via a two-level aggregate);
  * the threshold ladder then rolls ≤ |classes| rows into ≤ |ladder|
  * rows. No windows, no joins back to the corpus.
  */
object Anonymity {

  /** Per-threshold audit over `rows` grouped by `qi` with sensitive
    * column `sensitive`: for each k in `ladder`, how many classes and
    * rows fall BELOW k-anonymity, and how many classes fail distinct
    * l-diversity at l = 2 (all rows in the class share one sensitive
    * value).
    */
  def audit(rows: DataFrame, qi: Seq[Column], sensitive: Column,
      ladder: Seq[Int]): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    // two-level aggregate: (QI, sensitive) first so the class-grain
    // distinct count is an exchange-free second-level count
    val named = rows.select((qi :+ sensitive.as("sens")): _*)
    val qiNames = named.columns.dropRight(1).toSeq
    val classes = named
      .groupBy(named.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_sv"))
      .groupBy(qiNames.map(col): _*)
      .agg(sum(col("n_sv")).as("class_size"),
        count(lit(1)).as("n_sensitive_values"))
    val ladderDf = ladder.toDF("k")
    classes
      .crossJoin(broadcast(ladderDf))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"),
        sum(when(col("class_size") < col("k"), 1L).otherwise(0L))
          .as("classes_below_k"),
        coalesce(sum(when(col("class_size") < col("k"),
          col("class_size"))), lit(0L)).as("rows_below_k"),
        sum(when(col("n_sensitive_values") < 2L, 1L).otherwise(0L))
          .as("classes_failing_l2"))
      .select(col("k"), col("n_classes"), col("n_rows"),
        col("classes_below_k"), col("rows_below_k"),
        col("classes_failing_l2"),
        round(col("rows_below_k").cast("double")
          / col("n_rows").cast("double"), 6).as("reident_risk_share"))
      .orderBy(col("k"))
  }

  /** q190: release audit of the customer table under the classic QI
    * pair (nation, market segment) with the $1000 balance band as a
    * third quasi-identifier and the exact balance as the sensitive
    * value. Ladder k ∈ {2, 5, 10, 25}.
    */
  def anonymityQuery(s: SparkSession, dir: String): DataFrame =
    audit(
      Tables.customer(s, dir).withColumn("cents",
        round(col("c_acctbal") * 100).cast("long")),
      Seq(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        // balances go negative, so the band rule matters: BOTH Spark's
        // DIV and DuckDB's // truncate toward zero (measured — floor on
        // one side split 3 negative-balance classes), putting -$999.99
        // in band 0 on both engines
        expr("cents DIV 100000").as("bal_band")),
      col("cents"),
      ladder = Seq(2, 5, 10, 25))
}
