package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided testdata tables (`TESTDATA.md`).
  *
  * All engine queries are pure functions of `(SparkSession, sfDir)`; this
  * keeps the path wiring in one place. Parquet scans get predicate pushdown
  * and column pruning from Catalyst for free — callers should `select`/
  * `filter` as early as possible so `.explain` shows `PushedFilters` and a
  * narrow `ReadSchema`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as plain long and
    * rebuild the timestamp; the data is microsecond-precision (ns % 1000 == 0
    * across all SFs), so `div 1000` is lossless. Integer `div` — a double
    * division would lose precision above 2^53 ns (~1970+104 days).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
