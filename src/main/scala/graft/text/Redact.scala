package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII redaction for training-data hygiene: emails, phone numbers, and
  * URLs replaced by typed placeholder tokens via `regexp_replace` chains —
  * pure codegen'd column expressions, no UDF.
  *
  * The patterns deliberately use only constructs with identical semantics
  * in Java regex and RE2 (character classes, bounded/unbounded
  * quantifiers — no lookarounds, no backreferences) so the DuckDB oracle
  * can apply the very same strings with the 'g' flag.
  */
object Redact {

  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  /** 8+ chars, digit-anchored at both ends, separators inside. */
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val UrlRe = "https?://[^\\s]+"

  /** URL first (a URL may embed '@' or digit runs), then email, then phone. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "[URL]"),
        EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** q41: deterministic PII-bearing contact strings synthesized from the
    * customer table (the testdata corpus itself contains no PII), then
    * redacted — both engines build the identical raw string, so the oracle
    * checks the redaction semantics, not the synthesis.
    */
  def redactQuery(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir)
      .select(col("c_custkey"),
        concat(lit("reach "), col("c_name"), lit(" at user"), col("c_custkey"),
          lit("@mail.example.com or +1-555-0"), col("c_custkey"),
          lit(" or https://example.com/u/"), col("c_custkey")).as("raw"))
      .withColumn("clean", redact(col("raw")))
      .select(col("c_custkey"), col("clean"))
      .orderBy(col("c_custkey"))
}
