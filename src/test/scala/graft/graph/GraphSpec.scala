package graft.graph

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{BusinessEtl, ReviewEtl, Schemas, UserEtl}

/** Ports the reference's graph integrity suite
  * (`test_cases/neo4j_test.cypher:1-53`) against the DataFrame projection.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  val asOf: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00")

  lazy val users = UserEtl.transform(jsonDf(Schemas.user,
    """{"user_id":"u1","name":"Ann","review_count":2,"yelping_since":"2015-06-15 00:00:00","useful":1,"funny":0,"cool":0,"elite":"2020","friends":"u2","fans":1,"average_stars":4.0}""",
    """{"user_id":"u2","name":"Bob","review_count":1,"yelping_since":"2018-01-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"u1","fans":0,"average_stars":3.0}""",
    """{"user_id":"u3","name":"Cal","review_count":0,"yelping_since":"2020-01-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"","fans":0,"average_stars":0.0}"""),
    asOf)

  lazy val reviews = ReviewEtl.transform(jsonDf(Schemas.review,
    """{"review_id":"r1","user_id":"u1","business_id":"b1","stars":5.0,"useful":1,"funny":0,"cool":0,"text":"great","date":"2021-05-01 12:00:00"}""",
    """{"review_id":"r2","user_id":"u2","business_id":"b1","stars":4.0,"useful":0,"funny":0,"cool":0,"text":"good","date":"2021-05-02 12:00:00"}"""))

  lazy val businesses = BusinessEtl.transform(jsonDf(Schemas.business,
    """{"business_id":"b1","name":"Biz One","city":"Springfield","state":"IL","latitude":1.0,"longitude":2.0,"stars":4.0,"review_count":10,"is_open":1,"categories":"Food, Bar","hours":{"Monday":"9:0-17:0"},"attributes":{"HasTV":"True","DogsAllowed":"False","BusinessParking":"{'lot': 'True'}"}}""",
    """{"business_id":"b2","name":"Biz Two","city":"Springfield","state":"IL","latitude":1.0,"longitude":2.0,"stars":3.0,"review_count":5,"is_open":1,"categories":"Food","hours":{"Monday":"9:0-17:0"},"attributes":{"HasTV":"True"}}"""))

  test("Feature nodes + OFFERS edges project from amenity flags (cypher L83-90)") {
    // b1 fans out to 2 category rows — businessFeatures must still emit one
    // row per (business, feature); false/missing flags never surface.
    val feats = GraphExport.businessFeatures(businesses)
      .as[(String, String)].collect()
    assert(feats.length == 3)
    assert(feats.toSet == Set(
      ("b1", "has_tv"), ("b1", "parking_lot"), ("b2", "has_tv")))
    val nodes = GraphExport.featureNodes(businesses)
    assert(nodes.select("id").as[String].collect().toSet
      == Set("has_tv", "parking_lot"))
    // uniqueness constraint ≙ graph.cypher:19; orphan checks cover OFFERS
    assert(GraphChecks.duplicateKeys(nodes).count() == 0)
    val off = GraphExport.offers(businesses)
    assert(GraphChecks.orphanEdgesBySrc(off, GraphExport.businessNodes(businesses)).count() == 0)
    assert(GraphChecks.orphanEdgesByDst(off, nodes).count() == 0)
  }

  test("MERGE semantics: re-ingest (union of same batch) does not duplicate") {
    val doubled = reviews.union(reviews)
    assert(GraphExport.reviewNodes(doubled).count() == 2)
    assert(GraphExport.wrote(doubled).count() == 2)
    assert(GraphChecks.duplicateKeys(GraphExport.reviewNodes(doubled)).count() == 0)
  }

  test("FRIENDS_WITH closure is symmetric, deduped, no self-loops") {
    val fw = GraphExport.friendsWith(users)
    val edges = fw.select("src", "dst").as[(String, String)].collect().toSet
    assert(edges == Set(("u1", "u2"), ("u2", "u1"))) // u3 has no friends
    // symmetry: reversing the edge set is a no-op
    assert(edges.map(_.swap) == edges)
  }

  test("referential integrity: orphan detection via anti-joins") {
    val userNodes = GraphExport.userNodes(users)
    val wrote = GraphExport.wrote(reviews)
    assert(GraphChecks.orphanEdgesBySrc(wrote, userNodes).count() == 0)
    // now a review written by an unknown user
    val badWrote = wrote.union(Seq(("ghost", "r9")).toDF("src", "dst"))
    val orphans = GraphChecks.orphanEdgesBySrc(badWrote, userNodes)
    assert(orphans.select("src").as[String].collect().toSeq == Seq("ghost"))
  }

  test("friend_count matches actual FRIENDS_WITH degree (cypher L39-44)") {
    val fw = GraphExport.friendsWith(users)
    assert(GraphChecks.friendCountMismatch(users, fw).count() == 0)
  }

  test("CSV round-trip: header export + schema-typed scan (S5/S6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val nodes = GraphExport.reviewNodes(reviews)
    GraphExport.exportCsv(nodes, dir)
    // typed coercion on re-read ≙ the Cypher toFloat/toInteger/date() calls
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("stars", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("date", org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("sentiment_label", org.apache.spark.sql.types.StringType)))
    val back = GraphExport.importCsv(spark, dir, schema)
    assert(back.count() == 2)
    assert(back.schema("stars").dataType.typeName == "double")
    assert(back.schema("date").dataType.typeName == "date")
    val r1 = back.filter(col("id") === "r1").collect().head
    assert(r1.getDouble(1) == 5.0)
    assert(r1.getDate(2).toString == "2021-05-01")
  }
}
