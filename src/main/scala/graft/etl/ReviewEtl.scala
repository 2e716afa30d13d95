package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.text.Sentiment

/** Review-domain ETL (reference semantics: `ETL-script/Review_ETL.py:51-105`):
  * engagement score, JVM-native sentiment scoring + labels, timestamp/date
  * derivation. Narrow, shuffle-free pipeline.
  */
object ReviewEtl {

  def transform(raw: DataFrame): DataFrame = {
    GraftFunctions.register(raw.sparkSession)
    raw
      .filter(col("review_id").isNotNull && col("user_id").isNotNull
        && col("business_id").isNotNull)
      // engagement_score = useful+funny+cool (`Review_ETL.py:66-70`)
      .withColumn("engagement_score",
        coalesce(col("useful"), lit(0L)) + coalesce(col("funny"), lit(0L))
          + coalesce(col("cool"), lit(0L)))
      // sentiment via the codegen'd SentimentScore expression:
      // compound in [-1,1], 0.0 for null text, labels at ±0.05
      .withColumn("sentiment_score", GraftFunctions.sentiment(col("text")))
      .withColumn("sentiment_label", Sentiment.label(col("sentiment_score")))
      // date parsing (`Review_ETL.py:92-93`)
      .withColumn("review_ts", to_timestamp(col("date"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("date", to_date(col("review_ts")))
      .drop("useful", "funny", "cool", "text", "review_ts")
  }

  def fromJson(spark: SparkSession, path: String): DataFrame =
    transform(spark.read.schema(Schemas.review).json(path))
}
