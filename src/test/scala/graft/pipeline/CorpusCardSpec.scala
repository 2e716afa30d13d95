package graft.pipeline

import graft.SparkSpec

class CorpusCardSpec extends SparkSpec {
  import spark.implicits._

  test("card stats match a hand-computed corpus") {
    val good =
      "the quick brown fox jumps over a lazy dog and every active rabbit " +
      "climbs tall green trees while seven hungry birds watch quietly from " +
      "distant branches" // 26 tokens, passes the q112 battery
    val d = Seq(
      (1L, "s1", "en", good),
      (2L, "s1", "en", good),          // exact duplicate
      (3L, "s2", "fr", "le petit chat"))
      .toDF("doc_id", "source", "lang", "text")
    val m = CorpusCard.card(d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") === 3.0)
    assert(m("n_tokens") === 55.0)     // 26 + 26 + 3
    assert(m("n_sources") === 2.0)
    assert(m("n_langs") === 2.0)
    assert(m("exact_dup_rate") === BigDecimal(1.0 - 2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m("quality_pass_rate") === BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m("mean_doc_tokens") === BigDecimal(55.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
