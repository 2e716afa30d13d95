package graft.dedup

import graft.SparkSpec

class PPJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("ppjoin equals the unfiltered inverted-index join (parity)") {
    // crafted mix: exact dup, high-overlap pair, disjoint, subset
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",      // dup of 1
      3L -> "alpha beta gamma delta zeta",         // 4/6 with 1
      4L -> "one two three four five",             // disjoint
      5L -> "alpha beta",                          // small subset
      6L -> "alpha beta gamma delta epsilon zeta eta theta")
    for (t <- Seq(0.3, 0.5, 0.8, 0.95)) {
      val pp = PPJoin.similarPairs(d, t).collect().toSet
      val bf = PPJoin.bruteForcePairs(d, t).collect().toSet
      assert(pp == bf, s"threshold $t")
    }
  }

  test("ppjoin parity on a random corpus over a small vocabulary") {
    // small vocabulary forces heavy token sharing — the adversarial case
    // for prefix filtering (hot tokens everywhere)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val d = docs((1L to 40L).map(i =>
      i -> rnd.shuffle(vocab).take(2 + rnd.nextInt(6)).mkString(" ")): _*)
    val pp = PPJoin.similarPairs(d, 0.6).collect().toSet
    val bf = PPJoin.bruteForcePairs(d, 0.6).collect().toSet
    assert(pp == bf)
    assert(bf.nonEmpty) // the corpus must actually exercise the join
  }

  test("exact duplicates score 1.0; repeated tokens collapse to the set") {
    val d = docs(1L -> "x y z", 2L -> "z z z y y x") // same SET
    val out = PPJoin.similarPairs(d, 0.9).collect()
    assert(out.length == 1 && out(0).getDouble(2) == 1.0)
  }

  test("threshold 1.0 keeps only identical sets") {
    val d = docs(1L -> "x y z", 2L -> "x y z", 3L -> "x y z w")
    val out = PPJoin.similarPairs(d, 1.0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("candidate-volume guard: an over-budget corpus fails loudly, " +
    "and the same corpus passes under a sufficient budget") {
    // 40 single-token docs sharing one hot token: every doc's prefix IS
    // that token, so the prefix index alone implies C(40,2) = 780
    // candidates — deliberately over a 100-pair budget
    val hot = docs((1L to 40L).map(i => i -> "shared"): _*)
    val e = intercept[IllegalStateException] {
      PPJoin.similarPairsOver(PPJoin.docTokens(hot), threshold = 0.8,
        maxCandidates = 100L)
    }
    assert(e.getMessage.contains("780"))
    assert(e.getMessage.contains("maxCandidates=100"))
    // same corpus, adequate budget: runs to completion (all pairs J=1.0)
    val ok = PPJoin.similarPairsOver(PPJoin.docTokens(hot), threshold = 0.8,
      maxCandidates = 1000L).collect()
    assert(ok.length == 780 && ok.forall(_.getDouble(2) == 1.0))
    spark.catalog.clearCache()
  }
}
