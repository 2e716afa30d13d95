package graft.quality

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  test("fused aggregate checks count exactly the violating rows") {
    val df = Seq(
      (Some(1L), 10.0, "F"),
      (None, -5.0, "O"),          // null key + below range
      (Some(3L), 999.0, "X"),     // above range + bad status
      (Some(4L), 50.0, "P")
    ).toDF("k", "price", "status")
    val rep = Constraints.aggReport(df, Seq(
      Constraints.notNull("k"),
      Constraints.inRange("price", 0.0, 100.0),
      Constraints.acceptedValues("status", Seq("F", "O", "P"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("not_null(k)") === 1L)
    assert(rep("in_range(price)") === 2L)
    assert(rep("accepted_values(status)") === 1L)
  }

  test("uniqueness counts duplicates beyond the first per key") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("id")
    val r = Constraints.uniqueViolations(df, "id").collect().head
    assert(r.getLong(1) === 3L) // two extra 1s + one extra 3
    val clean = Constraints.uniqueViolations(Seq(1L, 2L).toDF("id"), "id")
      .collect().head
    assert(clean.getLong(1) === 0L, "empty duplicate set coalesces to 0")
  }

  test("referential check counts orphan foreign keys") {
    val fact = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = Constraints.refViolations(fact, "fk", dim, "pk").collect().head
    assert(r.getLong(1) === 2L, "both orphan rows count, not distinct keys")
  }
}
