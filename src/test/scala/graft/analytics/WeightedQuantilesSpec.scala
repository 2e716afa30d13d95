package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Weighted-quantile contracts: a hand-traced weighted median, the
  * weight-replication law (weight w ≡ w copies at weight 1),
  * scale-invariance of weights, and quantile monotonicity.
  */
class WeightedQuantilesSpec extends SparkSpec {

  private def df(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "v", "w")
  }

  private def run(rows: (String, Long, Long)*) =
    WeightedQuantiles.grouped(df(rows: _*), col("g"), col("v"), col("w"),
        quantiles = Seq((1, 4), (1, 2), (3, 4)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("hand-traced: cum weights pick each quantile's first-reaching " +
    "value") {
    // values 10(w3), 20(w2), 30(w5): W=10, cum 3/5/10;
    // k25=3 -> 10, k50=5 -> 20, k75=8 -> 30
    val out = run(("a", 10L, 3L), ("a", 20L, 2L), ("a", 30L, 5L))
    assert(out("a") === ((10L, 10L, 20L, 30L)))
  }

  test("weight replication: integer weights equal that many unit rows") {
    val weighted = run(("a", 100L, 3L), ("a", 200L, 5L), ("a", 300L, 2L))
    val unit = run(
      (Seq.fill(3)(("a", 100L, 1L)) ++ Seq.fill(5)(("a", 200L, 1L))
        ++ Seq.fill(2)(("a", 300L, 1L))): _*)
    assert(weighted("a") === unit("a"))
  }

  test("scaling every weight by a constant changes nothing") {
    val base = run(("a", 1L, 2L), ("a", 5L, 3L), ("a", 9L, 5L))
    val scaled = run(("a", 1L, 14L), ("a", 5L, 21L), ("a", 9L, 35L))
    assert(base("a")._2 === scaled("a")._2)
    assert(base("a")._3 === scaled("a")._3)
    assert(base("a")._4 === scaled("a")._4)
  }

  test("q201: quantiles are monotone within every group") {
    val rows = WeightedQuantiles
      .weightedQuantilesQuery(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qs = Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b },
        s"${r.getString(0)}: $qs")
    }
  }
}
