package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec
import graft.quality.Profiling

/** Ports the reference's business invariants (`test_cases/business.py`) and
  * the hours-engine edge cases (`Business_ETL.py:107-138`, SURVEY.md §7.4).
  */
class BusinessEtlSpec extends SparkSpec with TableDrivenPropertyChecks {

  def biz(
      id: String = "b1",
      isOpen: Long = 1,
      categories: String = "Food, Coffee & Tea",
      hours: String = """{"Monday":"9:0-17:0","Tuesday":"9:0-17:0"}""",
      attributes: String =
        """{"BusinessAcceptsCreditCards":"True","NoiseLevel":"u'average'","RestaurantsPriceRange2":"2"}"""): String =
    s"""{"business_id":"$id","name":"Biz $id","address":"1 Main St","city":"Springfield",
       |"state":"IL","postal_code":"62701","latitude":39.8,"longitude":-89.6,
       |"stars":4.0,"review_count":10,"is_open":$isOpen,
       |"categories":${if (categories == null) "null" else s""""$categories""""},
       |"hours":$hours,"attributes":$attributes}""".stripMargin.replaceAll("\n", "")

  test("quality gate: closed, null-categories, null-hours rows are dropped") {
    val df = BusinessEtl.transform(jsonDf(Schemas.business,
      biz("keep"),
      biz("closed", isOpen = 0),
      biz("nocats", categories = null),
      s"""{"business_id":"nohours","is_open":1,"categories":"Food","hours":null}"""))
    assert(rows(df.select("business_id")).map(_.getString(0)).distinct == Seq("keep"))
  }

  test("category explode: one row per trimmed category") {
    val df = BusinessEtl.transform(jsonDf(Schemas.business, biz()))
    assert(rows(df.select("category")).map(_.getString(0)).sorted
      == Seq("Coffee & Tea", "Food"))
  }

  test("output is flat: no struct/array/map columns survive") {
    val df = BusinessEtl.transform(jsonDf(Schemas.business, biz()))
    assert(Profiling.nonFlatColumns(df).isEmpty)
    assert(!df.columns.contains("address"))
    assert(df.schema("latitude").dataType.typeName == "double")
    assert(df.schema("longitude").dataType.typeName == "double")
  }

  test("attribute features: boolean cast, unquote, price_range int") {
    val r = rows(BusinessEtl.transform(jsonDf(Schemas.business, biz()))
      .select("business_accepts_credit_cards", "noise_level", "price_range")).head
    assert(r.getBoolean(0))
    assert(r.getString(1) == "average")
    assert(r.getInt(2) == 2)
  }

  test("hours engine: plain, overnight wrap, zero interval, missing day") {
    val cases = Table(
      ("hours", "weekly", "daysOpen"),
      ("""{"Monday":"9:0-17:0"}""", 8.0, 1),            // plain 8h
      ("""{"Monday":"22:0-2:0"}""", 4.0, 1),            // overnight +1440
      ("""{"Monday":"0:0-0:0"}""", 0.0, 0),             // zero ⇒ closed
      ("""{"Monday":"9:30-10:45"}""", 1.25, 1),         // minutes math
      ("""{}""", 0.0, 0))                               // all days missing
    forAll(cases) { (hours, weekly, daysOpen) =>
      val r = rows(BusinessEtl.transform(jsonDf(Schemas.business,
        biz(hours = hours, categories = "Food")))
        .select("weekly_open_hours", "days_open")).head
      assert(r.getDouble(0) == weekly)
      assert(r.getInt(1) == daysOpen)
    }
  }

  test("weekly_open_hours sums all seven days") {
    val hours =
      """{"Monday":"9:0-17:0","Tuesday":"9:0-17:0","Wednesday":"9:0-17:0",
        |"Thursday":"9:0-17:0","Friday":"9:0-17:0","Saturday":"10:0-14:0",
        |"Sunday":"22:0-2:0"}""".stripMargin.replaceAll("\n", "")
    val r = rows(BusinessEtl.transform(jsonDf(Schemas.business,
      biz(hours = hours, categories = "Food")))
      .select("weekly_open_hours", "days_open")).head
    assert(r.getDouble(0) == 8 * 5 + 4 + 4)
    assert(r.getInt(1) == 7)
  }
}
