package graft.pipeline

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("alpha=1 reduces to proportional mixing") {
    val d = docs(
      (1L, "big", ("w " * 90).trim),
      (2L, "small", ("w " * 10).trim))
    val plan = Mixture.mixturePlan(d, alpha = 1.0, budgetFraction = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(plan("big").getAs[Double]("weight") === 0.9)
    assert(plan("small").getAs[Double]("weight") === 0.1)
    assert(plan("big").getAs[Long]("target_tokens") === 90L)
    assert(plan("small").getAs[Long]("target_tokens") === 10L)
    assert(plan("big").getAs[Double]("epochs") === 1.0)
  }

  test("alpha<1 up-weights the small source (epochs > 1) at others' expense") {
    val d = docs(
      (1L, "big", ("w " * 1000).trim),
      (2L, "small", ("w " * 10).trim))
    val plan = Mixture.mixturePlan(d, alpha = 0.5, budgetFraction = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val wBig = plan("big").getAs[Double]("weight")
    val wSmall = plan("small").getAs[Double]("weight")
    assert(wSmall > 10.0 / 1010.0, "small source must exceed its raw share")
    assert(wBig < 1000.0 / 1010.0)
    assert(plan("small").getAs[Double]("epochs") > 1.0,
      "small source repeats under temperature sampling")
    assert(math.abs(wBig + wSmall - 1.0) < 1e-9)
  }

  test("targets never exceed the budget") {
    val d = docs(
      (1L, "a", ("w " * 57).trim),
      (2L, "b", ("w " * 43).trim),
      (3L, "c", ("w " * 11).trim))
    val rows = Mixture.mixturePlan(d, alpha = 0.7, budgetFraction = 0.5).collect()
    val total = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(total <= math.round(111 * 0.5))
  }
}
