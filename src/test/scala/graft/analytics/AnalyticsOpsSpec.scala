package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("paretoFrontier: dominated profiles drop, incomparable ones stay") {
    // (cost, benefit): (1,5) and (3,9) are the frontier; (2,4) is dominated
    // by (1,5) (costlier, smaller), (3,5) by (1,5), (4,9) by (3,9)
    val parts = Seq(
      ("b", 1.0, 5), ("b", 2.0, 4), ("b", 3.0, 9), ("b", 3.0, 5), ("b", 4.0, 9)
    ).toDF("g", "cost", "benefit")
    val out = CoreQueries.paretoFrontier(parts, "g", "cost", "benefit")
      .orderBy("cost").collect().map(r => (r.getDouble(1), r.getInt(2)))
    assert(out.toSeq == Seq((1.0, 5), (3.0, 9)))
  }

  test("paretoFrontier: equal profiles collapse to one frontier row") {
    // exact duplicates dominate nothing and must not shadow each other
    val parts = Seq(("b", 1.0, 5), ("b", 1.0, 5)).toDF("g", "cost", "benefit")
    val out = CoreQueries.paretoFrontier(parts, "g", "cost", "benefit").collect()
    assert(out.length == 1)
  }

  test("paretoFrontier: groups are independent") {
    val parts = Seq(("a", 1.0, 5), ("b", 2.0, 4)).toDF("g", "cost", "benefit")
    val out = CoreQueries.paretoFrontier(parts, "g", "cost", "benefit")
    assert(out.count() == 2) // (2,4) would be dominated only within group a
  }

  test("paretoFrontier: same cost keeps only the largest benefit") {
    val parts = Seq(("b", 1.0, 5), ("b", 1.0, 7)).toDF("g", "cost", "benefit")
    val out = CoreQueries.paretoFrontier(parts, "g", "cost", "benefit").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(7))
  }

  test("ewma fold matches the hand-computed recursion") {
    // s1 = 10; s2 = .3*20 + .7*10 = 13; s3 = .3*5 + .7*13 = 10.6
    val xs = Seq((java.sql.Date.valueOf("2024-01-01"), 10L),
      (java.sql.Date.valueOf("2024-01-02"), 20L),
      (java.sql.Date.valueOf("2024-01-03"), 5L))
      .toDF("day", "n")
    val out = xs.agg(sort_array(collect_list(struct(col("day"), col("n"))))
        .as("xs"))
      .select(aggregate(
        expr("slice(xs, 2, size(xs) - 1)"),
        element_at(col("xs"), 1).getField("n").cast("double"),
        (acc, x) => lit(0.3) * x.getField("n").cast("double")
          + lit(0.7) * acc).as("ewma"))
      .collect()(0).getDouble(0)
    assert(math.abs(out - 10.6) < 1e-12)
  }

  test("ewma of a single observation is that observation") {
    val xs = Seq((java.sql.Date.valueOf("2024-01-01"), 42L)).toDF("day", "n")
    val out = xs.agg(sort_array(collect_list(struct(col("day"), col("n"))))
        .as("xs"))
      .select(aggregate(
        expr("slice(xs, 2, size(xs) - 1)"),
        element_at(col("xs"), 1).getField("n").cast("double"),
        (acc, x) => lit(0.3) * x.getField("n").cast("double")
          + lit(0.7) * acc).as("ewma"))
      .collect()(0).getDouble(0)
    assert(out == 42.0)
  }
}
