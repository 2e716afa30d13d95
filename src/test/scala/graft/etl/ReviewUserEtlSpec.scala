package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.quality.Profiling

/** Ports the reference's review/user invariants (`test_cases/review.py`,
  * `test_cases/user.py`) plus the engine's documented deviations
  * (SURVEY.md §7.4: empty-friends guard, injectable as-of).
  */
class ReviewUserEtlSpec extends SparkSpec {

  def review(
      id: String, useful: Long = 2, funny: Long = 1, cool: Long = 3,
      text: String = "\"Great food!\"",
      date: String = "2021-05-01 12:30:00"): String =
    s"""{"review_id":"$id","user_id":"u_$id","business_id":"b_$id","stars":4.0,
       |"useful":$useful,"funny":$funny,"cool":$cool,"text":$text,
       |"date":"$date"}""".stripMargin.replaceAll("\n", "")

  test("review: engagement recomputation, drops, schema") {
    val df = ReviewEtl.transform(jsonDf(Schemas.review,
      review("r1"), review("r2", useful = 0, funny = 0, cool = 0)))
    // recompute check (`review.py:11-13`) — zero mismatches
    assert(rows(df.filter(col("engagement_score") =!= lit(6))
      .filter(col("review_id") === "r1")).isEmpty)
    assert(rows(df.filter(col("review_id") === "r2")
      .select("engagement_score")).head.getLong(0) == 0L)
    // dropped columns absent (`review.py:16-17`), sentiment present (L20)
    assert(!df.columns.contains("useful") && !df.columns.contains("text"))
    assert(df.columns.contains("sentiment_score"))
    assert(df.schema("date").dataType.typeName == "date")
    assert(Profiling.nonFlatColumns(df).isEmpty)
  }

  test("review: null text scores 0.0 / neutral; signed texts get signed labels") {
    val df = ReviewEtl.transform(jsonDf(Schemas.review,
      review("rpos", text = "\"Absolutely amazing, great food!\""),
      review("rneg", text = "\"Terrible service, awful and dirty.\""),
      review("rnull", text = "null")))
    val byId = rows(df.select("review_id", "sentiment_score", "sentiment_label"))
      .map(r => r.getString(0) -> (r.getFloat(1), r.getString(2))).toMap
    assert(byId("rnull") == (0.0f, "neutral"))
    assert(byId("rpos")._1 > 0.05f && byId("rpos")._2 == "positive")
    assert(byId("rneg")._1 < -0.05f && byId("rneg")._2 == "negative")
  }

  val asOf: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00")

  def user(
      id: String, elite: String = "2019,2020,2021", friends: String = "ua,ub",
      since: String = "2015-06-15 00:00:00"): String =
    s"""{"user_id":"$id","name":"User $id","review_count":5,
       |"yelping_since":"$since","useful":4,"funny":2,"cool":1,
       |"elite":"$elite","friends":"$friends","fans":3,"average_stars":3.9,
       |"compliment_hot":1,"compliment_more":2,"compliment_profile":3,
       |"compliment_cute":4,"compliment_list":5,"compliment_note":6,
       |"compliment_plain":7,"compliment_cool":8,"compliment_funny":9,
       |"compliment_writer":10,"compliment_photos":11}"""
      .stripMargin.replaceAll("\n", "")

  test("user: elite count, account age, compliment whitelist, engagement") {
    val df = UserEtl.transform(jsonDf(Schemas.user, user("u1")), asOf)
    val r = rows(df.select("elite_years_count", "account_age_years",
      "engagement_compliments").dropDuplicates()).head
    assert(r.getInt(0) == 3)
    assert(r.getLong(1) == 8L) // 2015-06-15 → 2024-01-01 = 8 whole years
    assert(r.getLong(2) == 7L) // 4+2+1
    // whitelist kept, others dropped (`User_ETL.py:72-74`)
    assert(UserEtl.complimentKeep.forall(df.columns.contains))
    assert(!df.columns.contains("compliment_hot"))
    assert(!df.columns.contains("compliment_plain"))
  }

  test("user: empty elite → 0; empty friends → friend_count 0, row kept") {
    val df = UserEtl.transform(jsonDf(Schemas.user,
      user("u2", elite = "", friends = "")), asOf)
    val r = rows(df.select("elite_years_count", "friend_count", "friend"))
    assert(r.size == 1) // explode_outer keeps the user
    assert(r.head.getInt(0) == 0)
    assert(r.head.getInt(1) == 0)
    assert(r.head.isNullAt(2))
  }

  test("user: friends explode to one row each; count matches degree") {
    val df = UserEtl.transform(jsonDf(Schemas.user,
      user("u3", friends = "ua, ub, uc")), asOf)
    val fs = rows(df.select("friend")).map(_.getString(0)).sorted
    assert(fs == Seq("ua", "ub", "uc"))
    assert(rows(df.select("friend_count").dropDuplicates()).head.getInt(0) == 3)
  }
}
