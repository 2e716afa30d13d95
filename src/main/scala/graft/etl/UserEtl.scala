package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-domain ETL (reference semantics: `ETL-script/User_ETL.py:50-112`):
  * engagement compliments, compliment whitelist, elite-year counting,
  * account age, friends fan-out.
  *
  * Deviations from the reference, both documented in SURVEY.md §7.4:
  *  - account age anchors on an explicit `asOf` timestamp instead of
  *    `current_timestamp()` (`User_ETL.py:90`) — deterministic, testable;
  *  - `split(friends, ",")` on "" yields [""] in Spark, which the reference
  *    propagates as a phantom friend row with friend_count=1
  *    (`User_ETL.py:98-100`); we guard to an empty array and keep the user
  *    row via explode_outer (friend=null, friend_count=0), which is what
  *    makes the degree-consistency check (`neo4j_test.cypher:39-44`)
  *    actually hold.
  */
object UserEtl {

  /** compliment_* columns kept by the whitelist (`User_ETL.py:72-74`). */
  val complimentKeep: Set[String] =
    Set("compliment_list", "compliment_writer", "compliment_note", "compliment_photos")

  def transform(raw: DataFrame, asOf: Timestamp): DataFrame = {
    val complimentDrops = raw.columns
      .filter(c => c.startsWith("compliment_") && !complimentKeep(c))

    raw
      .filter(col("user_id").isNotNull)
      .withColumn("engagement_compliments",
        coalesce(col("useful"), lit(0L)) + coalesce(col("funny"), lit(0L))
          + coalesce(col("cool"), lit(0L)))
      // elite years: "" or null → 0, else comma-count (`User_ETL.py:78-81`)
      .withColumn("elite_years_count",
        when(col("elite").isNull || col("elite") === "", 0)
          .otherwise(size(split(col("elite"), ","))))
      // account age against an injected as-of anchor (`User_ETL.py:87-90`)
      .withColumn("yelping_since_ts",
        to_timestamp(col("yelping_since"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("account_age_years",
        floor(months_between(lit(asOf), col("yelping_since_ts")) / 12).cast("long"))
      // friends fan-out with the empty-string guard (`User_ETL.py:97-101`)
      .withColumn("friends_arr",
        when(col("friends").isNull || col("friends") === "",
          array().cast("array<string>"))
          .otherwise(split(col("friends"), ",")))
      .withColumn("friend_count", size(col("friends_arr")))
      .withColumn("friend", explode_outer(col("friends_arr")))
      .withColumn("friend", trim(col("friend")))
      .drop((Seq("useful", "funny", "cool", "elite", "friends", "friends_arr",
        "yelping_since") ++ complimentDrops): _*)
  }

  def fromJson(spark: SparkSession, path: String, asOf: Timestamp): DataFrame =
    transform(spark.read.schema(Schemas.user).json(path), asOf)
}
