package graft.text

import graft.SparkSpec

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("a repetitive train bigram scores the holdout near-deterministically") {
    // train (even ids): 'a b' everywhere -> c(a,b)=3, c(a·)=3, vocab {a,b},
    // V=3; test doc 'a b': p = (3+1)/(3+3) = 2/3, nll = -ln(2/3) = 0.405465
    val d = docs(
      (0L, "s", "a b"), (2L, "s", "a b"), (4L, "s", "a b"),
      (1L, "s", "a b"))
    val r = Perplexity.sourceSummary(d, minCount = 1, nllThreshold = 4.2)
      .collect().head
    assert(r.getAs[Long]("n_docs") === 1L)
    assert(math.abs(r.getAs[Double]("avg_nll") - 0.405465) < 1e-6)
    assert(r.getAs[Long]("n_high_ppl") === 0L)
  }

  test("unseen test bigrams get the smoothed floor and can trip the gate") {
    // train: 'a b' repeated; test: 'b a' never seen -> p = 1/(c(b·)+V);
    // b never appears as LHS -> p = 1/V = 1/3, nll = ln 3 = 1.0986
    val d = docs(
      (0L, "s", "a b"), (2L, "s", "a b"),
      (1L, "s", "b a"))
    val r = Perplexity.sourceSummary(d, minCount = 1, nllThreshold = 1.0)
      .collect().head
    assert(math.abs(r.getAs[Double]("avg_nll") - math.log(3.0)) < 1e-6)
    assert(r.getAs[Long]("n_high_ppl") === 1L, "ln 3 > 1.0 trips the gate")
  }

  test("below-floor train tokens collapse to <unk> on both splits") {
    // minCount=2: 'rare' (1 train occurrence) maps to <unk>; the test doc
    // 'x rare' then scores the (x, <unk>) bigram, which train saw once
    val d = docs(
      (0L, "s", "x rare x x"),   // train tokens: x:3 (kept), rare:1 -> <unk>
      (2L, "s", "x x"),
      (1L, "s", "x rare"))
    val r = Perplexity.sourceSummary(d, minCount = 2, nllThreshold = 99.0)
      .collect().head
    // train bigrams after unk: (x,<unk>),(<unk>,x),(x,x) from doc0; (x,x) doc2
    // c(x,<unk>)=1, c(x·)=3, V=2 -> p=(1+1)/(3+2)=0.4, nll=-ln(0.4)=0.9163
    assert(math.abs(r.getAs[Double]("avg_nll") - 0.916291) < 1e-6)
  }

  test("per-source rollup counts only holdout docs") {
    val d = docs(
      (0L, "s1", "a b c"), (2L, "s2", "a b c"),
      (1L, "s1", "a b"), (3L, "s1", "b c"), (5L, "s2", "a b"))
    val m = Perplexity.sourceSummary(d, minCount = 1, nllThreshold = 99.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("s1" -> 2L, "s2" -> 1L))
  }
}
