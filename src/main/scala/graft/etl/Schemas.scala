package graft.etl

import org.apache.spark.sql.types._

/** Explicit StructTypes for the raw Yelp-shaped JSON-lines inputs.
  *
  * The reference infers these schemas on every run (an extra full pass over
  * the input — `ETL-script/Business_ETL.py:53`, `Review_ETL.py:51`,
  * `User_ETL.py:50`); the engine declares them once, which both deletes that
  * scan and makes the sources usable from Structured Streaming (streaming
  * file sources require a schema). Field inventory follows FIXTURES.md §A1-A3.
  */
object Schemas {

  /** `hours` is a struct of per-day "H:MM-H:MM" strings
    * (`Business_ETL.py:107-127`).
    */
  val days: Seq[String] =
    Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")

  val hoursType: StructType =
    StructType(days.map(d => StructField(d, StringType, nullable = true)))

  /** The 14 "True"/"False" attribute strings cast to boolean flags
    * (`Business_ETL.py:82-95`).
    */
  val booleanAttrs: Seq[String] = Seq(
    "AcceptsInsurance", "BusinessAcceptsCreditCards", "BikeParking",
    "BusinessAcceptsBitcoin", "ByAppointmentOnly", "Caters", "CoatCheck",
    "Corkage", "DriveThru", "DogsAllowed", "GoodForDancing", "GoodForKids",
    "HappyHour", "HasTV")

  /** Every attribute member the reference touches is a *string* at the JSON
    * level (some python-repr-quoted like "u'average'").
    */
  val attributesType: StructType = StructType(
    (booleanAttrs ++ Seq(
      "Ambience", "BusinessParking", "NoiseLevel", "WiFi",
      "RestaurantsPriceRange2", "Music", "RestaurantsCounterService"))
      .map(f => StructField(f, StringType, nullable = true)))

  /** Nested JSON-string schemas for `from_json` (`Business_ETL.py:72-77`):
    * all members StringType, mirroring the reference's declared schemas.
    */
  val ambienceType: StructType = StructType(
    Seq("romantic", "intimate", "classy", "hipster", "divey", "touristy",
      "trendy", "upscale", "casual")
      .map(f => StructField(f, StringType, nullable = true)))

  val businessParkingType: StructType = StructType(
    Seq("garage", "street", "validated", "lot", "valet")
      .map(f => StructField(f, StringType, nullable = true)))

  val business: StructType = StructType(Seq(
    StructField("business_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postal_code", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("stars", DoubleType),
    StructField("review_count", LongType),
    StructField("is_open", LongType),
    StructField("categories", StringType),
    StructField("hours", hoursType),
    StructField("attributes", attributesType)))

  val review: StructType = StructType(Seq(
    StructField("review_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("business_id", StringType),
    StructField("stars", DoubleType),
    StructField("useful", LongType),
    StructField("funny", LongType),
    StructField("cool", LongType),
    StructField("text", StringType),
    StructField("date", StringType)))

  val user: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("review_count", LongType),
    StructField("yelping_since", StringType),
    StructField("useful", LongType),
    StructField("funny", LongType),
    StructField("cool", LongType),
    StructField("elite", StringType),
    StructField("friends", StringType),
    StructField("fans", LongType),
    StructField("average_stars", DoubleType)) ++
    Seq("hot", "more", "profile", "cute", "list", "note", "plain", "cool",
      "funny", "writer", "photos")
      .map(c => StructField(s"compliment_$c", LongType)))
}
