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
  /** The testdata's `ts` encoding has varied across driver rounds:
    * TIMESTAMP(NANOS) — which Spark 4 refuses outright
    * ([PARQUET_TYPE_ILLEGAL]) unless read as plain long — through round 8,
    * native TIMESTAMP(MICROS) since round 9. Handle both by inspecting the
    * loaded schema:
    *   - long (nanosAsLong read of a NANOS file): rebuild the timestamp
    *     via integer `div 1000` — lossless because the data is
    *     microsecond-precision, and integer because a double division
    *     would lose precision above 2^53 ns (~1970+104 days);
    *   - TIMESTAMP_NTZ (Spark's default inference for a MICROS file not
    *     adjusted to UTC): cast to TIMESTAMP — value-identical under the
    *     engine's fixed UTC session timezone, and keeps every downstream
    *     query/oracle seeing the exact type all prior rounds saw.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      // a NEW encoding (strings, doubles, nested…) must fail loudly here,
      // not flow downstream as a silently-casted garbage timestamp
      case other => throw new IllegalStateException(
        s"events.ts arrived as unexpected type ${other.catalogString} — " +
          "teach Tables.events the new driver encoding explicitly")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
