package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shapley contracts: a hand-traced two-channel lattice, the efficiency
  * law Σφ = v(full), and symmetry on interchangeable channels.
  */
class ShapleySpec extends SparkSpec {

  private def touches(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "channel")
  }

  test("hand-traced 2-channel lattice: v(A)=1, v(B)=1, v(AB)=3 -> " +
    "phi_A = phi_B = 1.5") {
    val out = Shapley.credit(touches(
        (1L, "A"), (2L, "B"), (3L, "A"), (3L, "B")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq(("A", 3L, 1.5), ("B", 3L, 1.5)))
  }

  test("a dominant channel out-earns a dummy-ish one") {
    // A appears in every journey, B in one of three.
    val out = Shapley.credit(touches(
        (1L, "A"), (2L, "A"), (3L, "A"), (3L, "B")))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("A") > out("B"))
  }

  test("efficiency on testdata: channel credits sum to v(full), shares " +
    "to 1, and every credit is non-negative (v is monotone)") {
    val rows = Shapley.shapleyQuery(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val vFull = rows.head.getLong(2).toDouble
    val phiSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(phiSum - vFull) < 1e-3)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("touches stop strictly before the first purchase") {
    import spark.implicits._
    val schema = graft.Tables.events(spark, "/root/testdata/sf0.001").schema
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-11 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val df = Seq(
      (1L, t0, 7L, "view", 0.0, "{}"),      // before -> counted
      (2L, t1, 7L, "purchase", 1.0, "{}"),   // conversion
      (3L, t1, 7L, "click", 0.0, "{}"),      // same instant -> NOT counted
      (4L, t2, 7L, "signup", 0.0, "{}"))     // after -> NOT counted
      .toDF(schema.fieldNames.toIndexedSeq: _*)
    val got = Shapley.conversionTouches(df)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((7L, "view")))
  }
}
