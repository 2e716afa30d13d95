package graft.examples

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.etl.YelpPipeline
import graft.graph.{GraphChecks, GraphExport}
import graft.quality.Profiling

/** Executable end-to-end example of the Yelp-shaped pipeline: raw JSON →
  * three domain ETLs → unified table → graph projection + integrity checks.
  * Run: `sbt "runMain graft.examples.YelpDemo [workDir]"`.
  */
object YelpDemo {

  val businessJson: String =
    """{"business_id":"b1","name":"Cafe Uno","address":"1 Main","city":"Springfield","state":"IL","postal_code":"62701","latitude":39.8,"longitude":-89.6,"stars":4.5,"review_count":7,"is_open":1,"categories":"Food, Coffee","hours":{"Monday":"9:0-17:0","Friday":"22:0-2:0"},"attributes":{"BusinessAcceptsCreditCards":"True","NoiseLevel":"u'quiet'","RestaurantsPriceRange2":"2"}}
      |{"business_id":"b2","name":"Closed Place","is_open":0,"categories":"Bars","hours":{"Monday":"9:0-17:0"},"attributes":{}}"""
      .stripMargin

  val reviewJson: String =
    """{"review_id":"r1","user_id":"u1","business_id":"b1","stars":5.0,"useful":2,"funny":1,"cool":0,"text":"Absolutely amazing, great coffee!","date":"2021-05-01 12:30:00"}
      |{"review_id":"r2","user_id":"u2","business_id":"b1","stars":2.0,"useful":0,"funny":0,"cool":0,"text":"Terrible service, awful.","date":"2021-06-01 09:00:00"}"""
      .stripMargin

  val userJson: String =
    """{"user_id":"u1","name":"Ann","review_count":2,"yelping_since":"2015-06-15 00:00:00","useful":4,"funny":2,"cool":1,"elite":"2019,2020","friends":"u2","fans":3,"average_stars":4.2,"compliment_hot":1,"compliment_list":2,"compliment_note":3,"compliment_writer":4,"compliment_photos":5}
      |{"user_id":"u2","name":"Bob","review_count":1,"yelping_since":"2020-02-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"u1","fans":0,"average_stars":3.0}
      |{"user_id":"u3","name":"Cal","review_count":0,"yelping_since":"2022-03-01 00:00:00","useful":0,"funny":0,"cool":0,"elite":"","friends":"","fans":0,"average_stars":0.0}"""
      .stripMargin

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft-yelp-demo").toString)
    Files.createDirectories(Paths.get(work))
    Files.writeString(Paths.get(work, "business.json"), businessJson)
    Files.writeString(Paths.get(work, "review.json"), reviewJson)
    Files.writeString(Paths.get(work, "user.json"), userJson)

    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = s"$work/out"
    val uni = YelpPipeline.run(spark,
      s"$work/business.json", s"$work/review.json", s"$work/user.json",
      out, Timestamp.valueOf("2024-01-01 00:00:00"))
    println("UNIFIED SCHEMA: " + uni.columns.mkString(","))
    uni.orderBy("review_id").show(10, 40, vertical = true)
    println("nonFlat=" + Profiling.nonFlatColumns(uni))

    val b = spark.read.parquet(s"$out/business_processed")
    val u = spark.read.parquet(s"$out/user_processed")
    val r = spark.read.parquet(s"$out/review_processed")
    val fw = GraphExport.friendsWith(u)
    println("FRIENDS_WITH:"); fw.show()
    println("friendCountMismatch=" + GraphChecks.friendCountMismatch(u, fw).count())
    println("top reviewers of Cafe Uno:")
    GraphChecks.topReviewersOf(
      GraphExport.userNodes(u), GraphExport.wrote(r), GraphExport.reviews(r),
      GraphExport.reviewNodes(r), GraphExport.businessNodes(b), "Cafe Uno").show()
    spark.stop()
  }
}
