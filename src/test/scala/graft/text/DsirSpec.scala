package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSIR importance weighting on planted vocabularies: raw docs built from
  * target-corpus words must outscore raw docs built from raw-only words,
  * the Laplace-smoothed LLR must match a hand computation, and the
  * selection cut must keep exactly the top quantile (ties inclusive).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("target-like raw docs outscore raw-like raw docs") {
    // target speaks apple/banana; the raw pool's background is gravel/mud.
    // raw doc 10 is written in target words, raw doc 11 in raw words —
    // every word appears in >= minDf docs so nothing is OOV
    // distinct background lengths make the weight order strict:
    // w(3) < w(4) < w(11) < w(10); the 0.75 nearest-rank cut (rank 3 of 4)
    // lands exactly on doc 11's weight, keeping 11 and 10
    val d = docs(
      (1L, "en", "apple banana apple banana apple banana"),
      (2L, "en", "apple banana apple banana"),
      (3L, "xx", "gravel mud gravel mud gravel mud gravel mud"),
      (4L, "xx", "gravel mud gravel mud gravel mud"),
      (10L, "xx", "apple banana apple banana"),
      (11L, "xx", "gravel mud gravel mud"))
    val out = Dsir.importanceWeights(d, col("lang") === "en",
        minDf = 2, keepQuantile = 0.75)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.keySet === Set(3L, 4L, 10L, 11L)) // only the raw pool scores
    assert(out(10L)._1 > out(11L)._1, s"target-like must outscore: $out")
    assert(out(11L)._1 > out(4L)._1 && out(4L)._1 > out(3L)._1, s"$out")
    assert(out(10L)._2 && out(11L)._2, "top quantile must be selected")
    assert(!out(3L)._2 && !out(4L)._2,
      "pure raw-background docs must fall below the cut")
  }

  test("weight matches the hand-computed smoothed log-likelihood ratio") {
    // vocabulary {a, b} (minDf 1); target = "a a b", raw = "b b a" ∪ doc 10
    // ct(a)=2 ct(b)=1 nt=3; raw pool: doc 2 "b b a" + doc 10 "a a" →
    // cr(a)=3 cr(b)=2 nr=5; V=2
    val d = docs(
      (1L, "en", "a a b"),
      (2L, "xx", "b b a"),
      (10L, "xx", "a a"))
    val out = Dsir.importanceWeights(d, col("lang") === "en",
        minDf = 1, keepQuantile = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val llrA = math.log(((2 + 1.0) / (3 + 2)) / ((3 + 1.0) / (5 + 2)))
    val llrB = math.log(((1 + 1.0) / (3 + 2)) / ((2 + 1.0) / (5 + 2)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(10L) - r6(2 * llrA)) < 1e-9, s"got ${out(10L)}")
    assert(math.abs(out(2L) - r6(llrA + 2 * llrB)) < 1e-9, s"got ${out(2L)}")
  }

  test("all-OOV raw docs score 0 and still appear in the output") {
    val d = docs(
      (1L, "en", "common words common words"),
      (2L, "xx", "common words"),
      (10L, "xx", "zzz_unique_token")) // df=1 < minDf=2 -> OOV
    val out = Dsir.importanceWeights(d, col("lang") === "en",
        minDf = 2, keepQuantile = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.contains(10L) && out(10L) === 0.0)
  }

  test("selection keeps the exact top quantile on the real corpus") {
    val out = Dsir.dsirWeightsQuery(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val n = out.length
    val kept = out.count(_.getBoolean(3))
    // nearest-rank 0.8 cut: at least the top 20% survive; ties only add
    assert(kept >= n - math.ceil(0.8 * n).toInt + 1 - 1)
    assert(kept <= n)
    // the threshold is a weight some row actually has
    val weights = out.map(_.getDouble(2)).sorted
    val thr = weights(math.ceil(0.8 * n).toInt - 1)
    assert(out.forall(r => r.getBoolean(3) === (r.getDouble(2) >= thr)))
  }
}
