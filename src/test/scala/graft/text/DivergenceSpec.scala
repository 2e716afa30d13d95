package graft.text

import graft.SparkSpec

class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a single source IS the corpus: kl = tvd = 0 exactly") {
    val d = docs((1L, "s1", "a a b c"), (2L, "s1", "b c c a"))
    val out = Divergence.sourceDivergence(d, minDf = 1).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 0.0 && out.head.getDouble(3) === 0.0)
  }

  test("kl and tvd match the hand-computed smoothed distributions") {
    // s1: a=3 b=1 (n=4); s2: a=1 b=3; corpus: a=4 b=4 (n=8), V=2
    val d = docs((1L, "s1", "a a a b"), (2L, "s2", "b b b a"))
    val out = Divergence.sourceDivergence(d, minDf = 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val p = Seq(4.0 / 6, 2.0 / 6) // smoothed s1 over (a, b)
    val q = Seq(0.5, 0.5)
    val kl = r6(p.zip(q).map { case (pi, qi) => pi * math.log(pi / qi) }.sum)
    val tvd = r6(p.zip(q).map { case (pi, qi) => math.abs(pi - qi) }.sum / 2)
    assert(out("s1")._1 === 4L)
    assert(out("s1")._2 === kl && out("s1")._3 === tvd)
    // the a<->b swap makes the two sources exactly symmetric
    assert(out("s2")._2 === out("s1")._2 && out("s2")._3 === out("s1")._3)
  }

  test("a drifted source diverges more than an on-blend source") {
    // s1 and s2 share the corpus register; s3 speaks different words
    val d = docs(
      (1L, "s1", "spark query table join spark query"),
      (2L, "s2", "query table join spark table join"),
      (3L, "s3", "gravel basalt quartz gravel basalt quartz"))
    val out = Divergence.sourceDivergence(d, minDf = 1).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("s3")._1 > out("s1")._1 && out("s3")._1 > out("s2")._1)
    assert(out("s3")._2 > out("s1")._2 && out("s3")._2 > out("s2")._2)
  }

  test("sources missing vocabulary words still get finite divergences") {
    val d = docs(
      (1L, "s1", "x x y y z z"),
      (2L, "s2", "x x x x x x")) // never says y or z
    val out = Divergence.sourceDivergence(d, minDf = 1).collect()
    assert(out.length === 2)
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }
}
