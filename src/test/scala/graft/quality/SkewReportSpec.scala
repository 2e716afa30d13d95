package graft.quality

import graft.SparkSpec

class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("uniform keys report skew_factor 1 and an empty census") {
    val d = Seq.tabulate(100)(i => (i % 10).toLong).toDF("k")
    val r = SkewReport.keyReport(d, "t.k", "k").collect().head
    assert(r.getAs[Long]("n_rows") === 100L)
    assert(r.getAs[Long]("n_keys") === 10L)
    assert(r.getAs[Double]("avg_per_key") === 10.0)
    assert(r.getAs[Long]("max_per_key") === 10L)
    assert(r.getAs[Double]("skew_factor") === 1.0)
    assert(r.getAs[Long]("n_keys_over_10x") === 0L)
  }

  test("one hot key dominates the report") {
    // 991 rows on key 0, one row each on keys 1..9 -> avg 100, max 991
    val d = (Seq.fill(991)(0L) ++ (1L to 9L)).toDF("k")
    val r = SkewReport.keyReport(d, "t.k", "k").collect().head
    assert(r.getAs[Long]("max_per_key") === 991L)
    assert(r.getAs[Double]("skew_factor") === 9.91)
    assert(r.getAs[Long]("n_keys_over_10x") === 0L,
      "991 < 10x avg(100): census must use the avg, not the max")
    assert(r.getAs[Double]("avg_per_key") === 100.0)
  }

  test("census counts keys strictly above 10x the rounded average") {
    // few cold keys: a hot key can't exceed 10x an average it dominates
    // (cnt > 10(cnt+6)/7 has no solution), so the census stays empty
    val few = (Seq.fill(200)(0L) ++ (1L to 6L)).toDF("k")
    assert(SkewReport.keyReport(few, "t", "k").collect().head
      .getAs[Long]("n_keys_over_10x") === 0L)
    // many cold keys: avg = 199/100 = 1.99 -> threshold 19.9; 100 > 19.9
    val many = (Seq.fill(100)(0L) ++ (1L to 99L)).toDF("k")
    assert(SkewReport.keyReport(many, "t", "k").collect().head
      .getAs[Long]("n_keys_over_10x") === 1L)
  }
}
