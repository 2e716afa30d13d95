package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Business-domain ETL: raw JSON-lines → flat, feature-engineered table
  * (reference semantics: `ETL-script/Business_ETL.py:53-159`).
  *
  * Output is one row per (business, category) — the category fan-out is the
  * reference's explode (`Business_ETL.py:146`) — with no struct/array columns
  * surviving (the flatness rule, `README.md:160-161`,
  * `test_cases/business.py:17-20`).
  *
  * Scale notes: the whole pipeline is a shuffle-free narrow chain
  * (scan → filter → project → generate), so it whole-stage-codegens into a
  * single fused stage and scales linearly with input splits; the explode is
  * the only row-multiplying step (~avg categories/business ≈ 4×).
  */
object BusinessEtl {

  /** "H:MM-H:MM" → fractional open hours for one day, with the reference's
    * overnight wraparound: close < open means close + 24h
    * (`Business_ETL.py:107-127`). "0:0-0:0" yields 0; missing/null day
    * yields 0 via coalesce (`Business_ETL.py:129-131`).
    */
  def dayHours(interval: Column): Column = {
    val parts = split(interval, "-")
    def minutes(hm: Column): Column = {
      val t = split(hm, ":")
      t.getItem(0).cast("double") * 60.0 + t.getItem(1).cast("double")
    }
    val open = minutes(parts.getItem(0))
    val closeRaw = minutes(parts.getItem(1))
    val close = when(closeRaw < open, closeRaw + 1440.0).otherwise(closeRaw)
    coalesce((close - open) / 60.0, lit(0.0))
  }

  /** Strip a python-repr `u'quoted'` wrapper and lowercase; unquoted input
    * passes through lowercased. (The reference's bare
    * `lower(regexp_extract(c, "'([^']+)'", 1))` maps unquoted values to ""
    * — `Business_ETL.py:96`; we fall back to the raw value instead, a
    * documented deviation.)
    */
  def unquote(c: Column): Column =
    lower(coalesce(nullif(regexp_extract(c, "'([^']+)'", 1), lit("")), c))

  /** Full business transform. Input must match [[Schemas.business]]. */
  def transform(raw: DataFrame): DataFrame = {
    val boolFlags = Schemas.booleanAttrs.map(a =>
      col(s"attributes.$a").cast("boolean").as(toSnake(a)))

    val hourCols = Schemas.days.map(d =>
      dayHours(col("hours").getField(d)).as(s"hours_${d.toLowerCase}"))

    val withFeatures = raw
      // the reference's data-quality gate (`Business_ETL.py:61-64`)
      .filter(col("business_id").isNotNull)
      .filter(col("categories").isNotNull && col("hours").isNotNull)
      .filter(col("is_open") === 1)
      .select(
        (Seq(
          trim(col("business_id")).as("business_id"),
          col("name"), col("city"), col("state"), col("postal_code"),
          col("latitude"), col("longitude"), col("stars"), col("review_count"))
          ++ boolFlags ++ Seq(
          unquote(col("attributes.NoiseLevel")).as("noise_level"),
          unquote(col("attributes.WiFi")).as("wifi"),
          col("attributes.RestaurantsPriceRange2").cast("int").as("price_range"),
          from_json(col("attributes.Ambience"), Schemas.ambienceType).as("ambience"),
          from_json(col("attributes.BusinessParking"), Schemas.businessParkingType).as("parking"),
          split(col("categories"), ",\\s*").as("categories_array"))
          ++ hourCols): _*)

    val dayHourCols = Schemas.days.map(d => col(s"hours_${d.toLowerCase}"))
    val flat = withFeatures
      // ambience/parking land as boolean feature flags, keeping output flat
      .withColumn("ambience_casual", col("ambience.casual").cast("boolean"))
      .withColumn("ambience_classy", col("ambience.classy").cast("boolean"))
      .withColumn("parking_lot", col("parking.lot").cast("boolean"))
      .withColumn("parking_garage", col("parking.garage").cast("boolean"))
      // horizontal folds (`Business_ETL.py:133-135`)
      .withColumn("weekly_open_hours", dayHourCols.reduce(_ + _))
      .withColumn("days_open",
        dayHourCols.map(c => when(c > 0.0, 1).otherwise(0)).reduce(_ + _))
      .drop("ambience", "parking")

    // category fan-out; trim each (`Business_ETL.py:145-146`)
    flat
      .withColumn("category", explode(col("categories_array")))
      .withColumn("category", trim(col("category")))
      .filter(col("category") =!= "")
      .drop("categories_array")
  }

  /** CamelCase attribute name → snake_case flag name. */
  def toSnake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  def fromJson(spark: SparkSession, path: String): DataFrame =
    transform(spark.read.schema(Schemas.business).json(path))
}
