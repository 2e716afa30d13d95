package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-drift tolerant reads and writes — the source-side counterpart of
  * `UnifiedJoin`'s overlap renaming: upstream feeds add and drop columns
  * over time, and a pipeline that hard-fails on the first drifted file is
  * not operable at 100 TB (where a single day's ingest spans thousands of
  * files written by different producer versions).
  *
  * Reference tie: the reference's ETLs re-declare their expected schema on
  * every run (`Schemas.scala` mirrors that); this module handles the files
  * that DON'T match it.
  *
  * 100 TB shape: `mergeSchema` costs one footer read per file at planning
  * time (no data pass); `alignTo` is pure projection — no shuffle, and
  * column pruning still reaches the scan because the added null columns
  * are literals.
  */
object SchemaDrift {

  /** Read a set of parquet paths whose schemas may have drifted; the
    * result schema is the union of all file schemas (missing columns are
    * null-filled per file).
    */
  def readMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Project `df` onto exactly `target`: missing columns appear as typed
    * nulls, extra columns drop, order follows `target`. Makes any drifted
    * frame appendable to a fixed-contract sink.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** q139: [[alignTo]] through the driver gate — customer projected onto
    * a drifted contract that exercises all three moves at once: a column
    * the table lacks (`c_phone`, typed null), a widening cast
    * (`c_nationkey` INT→BIGINT), dropped columns (`c_name`, `c_acctbal`),
    * and a reorder. The oracle is the same projection in SQL.
    */
  def schemaAlignQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val contract = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("c_phone", StringType),
      StructField("c_nationkey", LongType)))
    alignTo(graft.Tables.customer(spark, dir), contract)
      .orderBy(col("c_custkey"))
  }
}
