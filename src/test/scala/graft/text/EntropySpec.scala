package graft.text

import graft.SparkSpec

class EntropySpec extends SparkSpec {
  import spark.implicits._

  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("uniform, constant, and mixed token distributions") {
    val docs = Seq(
      (1L, "a b c d"),     // uniform over 4 → ln 4
      (2L, "a a a a"),     // constant → 0
      (3L, "a a b b b b")  // ln 6 − (2·ln2 + 4·ln4)/6
    ).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((4L, round4(math.log(4)))))
    assert(out(2L) == ((4L, 0.0)))
    val h3 = math.log(6) - (2 * math.log(2) + 4 * math.log(4)) / 6
    assert(out(3L) == ((6L, round4(h3))))
  }

  test("entropy is permutation-invariant (counts, not positions)") {
    val docs = Seq((1L, "x y x y"), (2L, "x x y y")).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(docs).collect().map(_.getDouble(2))
    assert(out(0) == out(1))
  }
}
