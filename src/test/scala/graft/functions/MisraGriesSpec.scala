package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextOps

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def stream(items: Seq[String], parts: Int = 4) =
    spark.createDataset(items).repartition(parts).toDF("item")

  /** exact heavy hitters: frequency * k > n */
  private def exact(items: Seq[String], k: Int): Set[(String, Long)] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toSet.map(identity[(String, Long)])
  }

  test("heavyHitters equals the exact computation on a skewed stream") {
    // vocabulary 100 ≫ buffer k−1 = 7: eviction must fire on every mapper
    val rnd = new scala.util.Random(11)
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2")
    val tail = Seq.fill(700)(s"cold${rnd.nextInt(100)}")
    val items = rnd.shuffle(heavy ++ tail)
    val out = TextOps.heavyHitters(stream(items), "item", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == exact(items, 8))
  }

  test("result is invariant under partitioning (merge-order independence)") {
    val rnd = new scala.util.Random(23)
    val items = rnd.shuffle(
      Seq.fill(500)("a") ++ Seq.fill(200)("b") ++
        (1 to 600).map(i => s"t${i % 150}"))
    val results = Seq(1, 3, 13).map { p =>
      TextOps.heavyHitters(stream(items, p), "item", 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(results.distinct.size == 1)
    assert(results.head.nonEmpty)
  }

  test("sketch alone never loses a true heavy hitter (superset guarantee)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    // worst case for MG: heavy item interleaved with a flood of uniques
    val items = rnd.shuffle(
      Seq.fill(300)("heavy") ++ (1 to 900).map(i => s"u$i"))
    val cands = stream(items, 7)
      .agg(GraftFunctions.heavyCandidates(col("item"), 4).as("c"))
      .select(explode(col("c")).as("item"))
      .collect().map(_.getString(0)).toSet
    assert(cands.size <= 3) // |buffer| ≤ k−1 even after merges
    assert(cands.contains("heavy")) // freq 300 > 1200/4
  }

  test("no items above threshold yields an empty result, not noise") {
    val items = (1 to 1000).map(i => s"u${i % 500}") // all freq 2, k=100
    val out = TextOps.heavyHitters(stream(items), "item", 100).collect()
    assert(out.isEmpty)
  }

  test("SQL surface: graft_heavy_candidates is callable and bounded") {
    GraftFunctions.register(spark)
    stream(Seq.fill(50)("x") ++ (1 to 100).map(_.toString), 3)
      .createOrReplaceTempView("mg_in")
    val arr = spark.sql(
      "SELECT graft_heavy_candidates(item, 5) AS c FROM mg_in")
      .collect()(0).getSeq[String](0)
    assert(arr.size <= 4 && arr.contains("x"))
  }
}
