package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnifiedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("overlap rename: fact collisions get factPrefix, dim2 collisions get dim2Prefix") {
    val fact = Seq((1L, 10L, 100L, "f")).toDF("k1", "k2", "shared", "both")
    val dim1 = Seq((10L, 200L, "d1")).toDF("k1", "shared", "other")
    val dim2 = Seq((100L, "d2", "x")).toDF("k2", "both", "onlyd2")
    // fact∩dim1 minus keys = {shared}; (fact∪dim1)∩dim2 minus keys = {both}
    val out = UnifiedJoin.unify(
      fact, dim1, dim2, key1 = "k1", key2 = "k2", factPrefix = "f", dim2Prefix = "b")
    val cols = out.columns.toSet
    assert(cols.contains("f_shared"), s"got $cols") // fact side renamed
    assert(cols.contains("shared"))                 // dim1 keeps original
    assert(cols.contains("b_both"))                 // dim2 side renamed
    assert(cols.contains("both"))                   // fact keeps original
    assert(cols.contains("onlyd2"))
  }

  test("key2 on both fact and dim1: dim1's copy renamed, no ambiguity") {
    // review-shaped: fact carries business_id (drives the dim2 join), and
    // dim1 ALSO has a business_id column (schema drift)
    val fact = Seq((1L, 100L, 7L)).toDF("k1", "k2", "payload")
    val dim1 = Seq((1L, 999L, "d1")).toDF("k1", "k2", "other")
    val dim2 = Seq((100L, "d2")).toDF("k2", "attr")
    val out = UnifiedJoin.unify(fact, dim1, dim2, "k1", "k2", "f", "b")
    assert(out.count() == 1)
    val r = out.collect().head
    assert(r.getAs[Long]("k2") == 100L)        // fact's key drove the join
    assert(r.getAs[Long]("b_ref_k2") == 999L)  // dim1's copy kept, renamed
    assert(r.getAs[String]("attr") == "d2")    // dim2 matched on fact's key
  }

  test("rename is deterministic (sorted fold) and left joins preserve fact rows") {
    val fact = Seq((1L, 99L), (2L, 10L)).toDF("k1", "k2") // k1=1 has no dim1 match? keys below
    val dim1 = Seq((1L, "a")).toDF("k1", "v1")
    val dim2 = Seq((10L, "b")).toDF("k2", "v2")
    val out = UnifiedJoin.unify(fact, dim1, dim2, "k1", "k2")
    assert(out.count() == 2) // left joins: all fact rows survive
    val r = out.filter(col("k2") === 99L).collect().head
    assert(r.getAs[Any]("v2") == null)
  }

  test("yelp pipeline: unified table is review-grain with prefixed collisions") {
    val asOf = Timestamp.valueOf("2024-01-01 00:00:00")
    val b = BusinessEtl.transform(jsonDf(Schemas.business,
      """{"business_id":"b1","name":"Cafe","city":"Springfield","state":"IL","stars":4.5,"review_count":7,"is_open":1,"categories":"Food, Coffee","hours":{"Monday":"9:0-17:0"},"attributes":{"BusinessAcceptsCreditCards":"True"}}"""))
    val r = ReviewEtl.transform(jsonDf(Schemas.review,
      """{"review_id":"r1","user_id":"u1","business_id":"b1","stars":5.0,"useful":1,"funny":0,"cool":0,"text":"great","date":"2021-05-01 12:30:00"}""",
      """{"review_id":"r2","user_id":"u1","business_id":"b1","stars":3.0,"useful":0,"funny":0,"cool":0,"text":"bad","date":"2021-06-01 09:00:00"}"""))
    val u = UserEtl.transform(jsonDf(Schemas.user,
      """{"user_id":"u1","name":"Ann","review_count":2,"yelping_since":"2015-06-15 00:00:00","useful":1,"funny":1,"cool":1,"elite":"2020","friends":"u2,u3","fans":1,"average_stars":4.0}"""), asOf)
    val uni = YelpPipeline.unified(r, u, b)
    assert(uni.count() == 2) // review grain, no fan-out multiplication
    val cols = uni.columns.toSet
    // business collides with fact∪dim1 on stars/name/review_count
    // ⇒ those columns are business_-prefixed on the dim2 side
    assert(cols.contains("stars") && cols.contains("business_stars"))
    assert(cols.contains("name") && cols.contains("business_name"))
    assert(cols.contains("review_count") && cols.contains("business_review_count"))
    assert(cols.contains("categories")) // re-aggregated flat string
    val row = uni.filter(col("review_id") === "r1").collect().head
    assert(row.getAs[String]("categories") == "Coffee, Food")
  }
}
