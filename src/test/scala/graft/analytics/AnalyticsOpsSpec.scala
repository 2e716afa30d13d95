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

  test("gini: perfectly equal values score exactly 0") {
    val d = (1L to 40L).map(i => (i, 100.0)).toDF("id", "x")
    val g = CoreQueries.gini(d, bucketW = 50.0, maxBucket = 9L)
      .collect()(0).getAs[Double]("gini")
    assert(g == 0.0)
  }

  test("gini: total concentration scores (n-1)/n") {
    val d = ((1L to 9L).map(i => (i, 0.0)) :+ (10L, 500.0)).toDF("id", "x")
    val g = CoreQueries.gini(d, bucketW = 50.0, maxBucket = 9L)
      .collect()(0).getAs[Double]("gini")
    assert(math.abs(g - 0.9) < 1e-9)
  }

  test("gini: bucket width does not change the result (rank-offset parity)") {
    val rnd = new scala.util.Random(3)
    val d = (1L to 200L).map(i => (i, rnd.nextDouble() * 1000)).toDF("id", "x")
    val gs = Seq(1.0, 97.0, 100000.0).map(w =>
      CoreQueries.gini(d, w, maxBucket = 24L).collect()(0).getAs[Double]("gini"))
    assert(gs.distinct.size == 1) // incl. w=100000: every row in bucket 0
  }

  test("association rules: hand-computed support/confidence/lift") {
    // baskets: {A,B,C}, {A,B}, {A,C}, {B} → AB n=2, AC n=2, BC n=1
    val b = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B")).toDF("o", "p")
    val out = Association.pairRules(b, "o", "p", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    // n_baskets=4, n_A=3, n_B=3, n_C=2
    assert(out.toSeq == Seq(
      ("A", "B", 2L, 0.5, 2.0 / 3, 2.0 / 3, 8.0 / 9),
      ("A", "C", 2L, 0.5, 2.0 / 3, 1.0, 4.0 / 3)
    ).map(t => (t._1, t._2, t._3,
      math.rint(t._4 * 1e6) / 1e6, math.rint(t._5 * 1e6) / 1e6,
      math.rint(t._6 * 1e6) / 1e6, math.rint(t._7 * 1e6) / 1e6)))
  }

  test("association rules: duplicate line items collapse to the basket set") {
    val b = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("o", "p")
    val out = Association.pairRules(b, "o", "p", minCount = 2L).collect()
    assert(out.length == 1 && out(0).getLong(2) == 2L) // AB counted once/basket
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
