package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Data-quality profiling and invariant checks — the reference's in-pipeline
  * assertions (the `test_cases` scripts, `Review_ETL.py:57-63`) as reusable library
  * operators. All single-pass; the null profile is one aggregate over the
  * scan (no per-column jobs), which is the shape that survives 100 TB.
  */
object Profiling {

  /** Null count for every column in a single pass
    * (`Review_ETL.py:58-63`, `User_ETL.py:55-60`).
    */
  def nullProfile(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*)

  /** Rows where every column is null (`test_cases/business.py:27-30` —
    * intent; the reference's own code for this is broken Python). Empty =
    * pass.
    */
  def allNullRows(df: DataFrame): DataFrame =
    df.filter(df.columns.map(col(_).isNull).reduce(_ && _))

  /** Rows with a null in any of the given key columns
    * (`test_cases/business.py:6`, `review.py:6-8`, `user.py:6`). Empty =
    * pass.
    */
  def nullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNull).reduce(_ || _))

  /** Column names violating the flat-output rule — struct/array/map columns
    * (`README.md:160-161`, `test_cases/business.py:17-20`). Empty = pass.
    * Pure schema inspection, no job.
    */
  def nonFlatColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[StructType]
        || f.dataType.isInstanceOf[ArrayType]
        || f.dataType.isInstanceOf[MapType] => f.name
    }.toSeq

  /** Rows where `derived` disagrees with its recomputation from inputs —
    * the reference's recomputation tests (`test_cases/review.py:11-13`,
    * `user.py:9-11`). Empty = pass.
    */
  def recomputeMismatch(
      df: DataFrame, derived: String, inputs: Seq[String]): DataFrame =
    // null-safe inequality: a NULL derived value IS a mismatch (plain =!=
    // yields null there and the filter would silently pass the broken row)
    df.filter(!(col(derived) <=>
      inputs.map(c => coalesce(col(c), lit(0L))).reduce(_ + _)))

  /** One-row summary of the standard invariants for dashboards/alerts. */
  def summary(df: DataFrame, keys: Seq[String]): DataFrame = {
    val keyNulls = keys.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.agg(count(lit(1)).as("n_rows"), keyNulls: _*)
      .withColumn("non_flat_columns", lit(nonFlatColumns(df).mkString(",")))
  }
}
