package graft.etl

import graft.SparkSpec

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("PERMISSIVE split: clean rows parse, corrupt lines kept verbatim") {
    val lines = Seq(
      """{"review_id":"r1","user_id":"u1","business_id":"b1","stars":5.0,"useful":1,"funny":0,"cool":0,"text":"ok","date":"2021-05-01 12:00:00"}""",
      """{"review_id":"r2","user_id":"u2",THIS IS NOT JSON""",
      """{"review_id":"r3","user_id":"u3","business_id":"b3","stars":"not-a-number-but-string-coerces-null","useful":0,"funny":0,"cool":0,"text":"x","date":"2021-05-02 12:00:00"}""",
      """garbage line""").toDS
    val (clean, bad) = Quarantine.splitJson(spark, Schemas.review, lines)
    val cleanIds = clean.select("review_id").as[String].collect().toSet
    assert(cleanIds.contains("r1"))
    assert(!cleanIds.contains("r2"))
    val rawBad = bad.as[String].collect()
    assert(rawBad.length >= 2)
    // quarantined lines are byte-identical for replay
    assert(rawBad.contains("""garbage line"""))
    assert(rawBad.exists(_.contains("THIS IS NOT JSON")))
    // schema of the clean side is exactly the declared schema
    assert(clean.schema.fieldNames.toSeq == Schemas.review.fieldNames.toSeq)
    spark.catalog.clearCache()
  }
}
