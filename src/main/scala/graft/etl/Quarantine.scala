package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corrupt-record quarantine for JSON ingest: read PERMISSIVE with a
  * `_corrupt_record` column, split the batch into (clean, quarantined)
  * instead of letting one malformed line fail the job (FAILFAST) or
  * silently vanish (DROPMALFORMED). At 100 TB something is ALWAYS
  * malformed; the pipeline's contract is that bad lines land in a
  * replayable side channel with full fidelity, not that they don't exist.
  *
  * Spark caveat encoded here: a PERMISSIVE scan only populates the
  * corrupt column if it is part of the declared schema, and the corrupt
  * rows cannot be referenced alone straight off the scan (Catalyst prunes
  * the parse) — hence the eager split on a single pass.
  */
object Quarantine {

  val CorruptCol = "_corrupt_record"

  /** Schema + corrupt-record column. */
  def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** One PERMISSIVE scan → (clean rows in `schema`, corrupt raw lines).
    * Clean = the corrupt column is null; quarantine keeps the raw line
    * untouched for replay after a parser/schema fix.
    *
    * Caching contract (same as the Dedup pair miners): the parsed batch
    * is cached because both halves consume it, and this function cannot
    * unpersist what its lazy results still reference — callers should
    * `spark.catalog.clearCache()` (or unpersist the inputs' plans) after
    * materializing both sides in a long-lived session.
    */
  def splitJson(spark: SparkSession, schema: StructType,
      lines: org.apache.spark.sql.Dataset[String]): (DataFrame, DataFrame) = {
    val parsed = spark.read.schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(lines)
      .cache() // one parse feeds both halves
    val clean = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col): _*)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, bad)
  }

  /** q140: [[splitJson]] through the driver gate on a deterministic
    * corpus — customer rows rendered as JSON lines with every
    * `c_custkey % 7 == 3` line truncated mid-string (invalid for any
    * parser, so Spark's PERMISSIVE split and the oracle's `json_valid`
    * agree on exactly which lines quarantine). Output: per-segment
    * counts/sums from the CLEAN half plus one `__quarantined__` row
    * carrying the bad-line count and total raw length — proving the
    * quarantined lines survive verbatim.
    */
  def quarantineQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.LongType
    val whole = concat(lit("{\"k\":"), col("c_custkey").cast(StringType),
      lit(",\"seg\":\""), col("c_mktsegment"), lit("\"}"))
    val raw = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), whole.as("l"))
      .select(when(col("c_custkey") % 7 === 3,
        expr("substring(l, 1, length(l) - 2)")).otherwise(col("l")).as("line"))
      .as[String]
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("seg", StringType)))
    val (clean, bad) = splitJson(spark, schema, raw)
    val cleanAgg = clean.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    val badAgg = bad.agg(count(lit(1)).as("n"),
      sum(length(col("raw_line")).cast(LongType)).as("sum_k"))
      .select(lit("__quarantined__").as("seg"), col("n"), col("sum_k"))
    cleanAgg.unionByName(badAgg).orderBy(col("seg"))
  }
}
