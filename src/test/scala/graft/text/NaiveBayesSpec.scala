package graft.text

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("separable vocabularies classify the holdout perfectly") {
    // even ids train, odd ids test; each lang has a disjoint vocabulary
    val en = "hello world good morning friends"
    val fr = "bonjour monde salut amis matin"
    val d = docs(
      (0L, "en", en), (2L, "en", en), (4L, "en", en),
      (1L, "en", en), (3L, "en", en),
      (10L, "fr", fr), (12L, "fr", fr), (14L, "fr", fr),
      (11L, "fr", fr), (13L, "fr", fr))
    val cm = NaiveBayes.langConfusion(d, minDf = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm === Map(("en", "en") -> 2L, ("fr", "fr") -> 2L))
  }

  test("all-OOV test docs fall back to the prior argmax") {
    // 'fr' has MORE training docs -> larger prior; the odd test doc shares
    // no vocab token, so its score is prior-only and must predict 'fr'
    val d = docs(
      (0L, "en", "hello world hello world"),
      (2L, "fr", "bonjour monde salut amis"),
      (4L, "fr", "bonjour monde salut amis"),
      (6L, "fr", "bonjour monde salut amis"),
      (1L, "en", "zzz qqq xxx www"))
    val cm = NaiveBayes.langConfusion(d, minDf = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm === Map(("en", "fr") -> 1L))
  }

  test("confusion matrix counts every holdout doc exactly once") {
    val d = docs((0L to 19L).map { i =>
      val lang = if (i % 4 < 2) "en" else "fr"
      val text = if (lang == "en") "the cat sat on the mat" else "le chat sur le tapis"
      (i, lang, text)
    }: _*)
    val cm = NaiveBayes.langConfusion(d, minDf = 1).collect()
    assert(cm.map(_.getLong(2)).sum === 10L) // the 10 odd doc_ids
  }

  test("tie-break picks the lexicographically smallest language") {
    // symmetric classes: identical priors and identical likelihoods for the
    // test doc's tokens -> scores tie exactly -> 'aa' must win over 'bb'
    val d = docs(
      (0L, "aa", "shared token list"),
      (2L, "bb", "shared token list"),
      (1L, "bb", "shared token list"))
    val cm = NaiveBayes.langConfusion(d, minDf = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm === Map(("bb", "aa") -> 1L))
  }
}
