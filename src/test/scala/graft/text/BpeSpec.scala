package graft.text

import graft.SparkSpec

/** BPE trainer semantics on the classic Sennrich example vocabulary —
  * merges hand-computed, including the lexicographic tie-breaks and the
  * greedy non-overlapping merge application.
  */
class BpeSpec extends SparkSpec {

  test("learned merges match the hand-computed Sennrich example") {
    import spark.implicits._
    val vocab = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
    ).toDF("word", "w")
    val merges = Bpe.train(vocab, nMerges = 6)
    // hand derivation: "es" appears in newest(6)+widest(3)=9; after (e,s)
    // and (es,t), "est</w>" fuses at 9; then l/o at 7 (tie with (o,w),
    // lex "l" < "o"); lo/w at 7; then the 6-way tie (e,w)/(n,e)/(w,est</w>)
    // breaks to (e,w) by left symbol
    assert(merges == Seq(
      Bpe.Merge(1, "e", "s", 9),
      Bpe.Merge(2, "es", "t", 9),
      Bpe.Merge(3, "est", "</w>", 9),
      Bpe.Merge(4, "l", "o", 7),
      Bpe.Merge(5, "lo", "w", 7),
      Bpe.Merge(6, "e", "w", 6)))
  }

  test("merge application is greedy non-overlapping ('aaa' + (a,a) → aa|a)") {
    import spark.implicits._
    // one word "aaaa" (weight 1): pair (a,a) counts 3 overlapping
    // occurrences; applying it must produce [aa, aa, </w>] — greedy
    // left-to-right, never [a, aa, a]. Round 2 ties (aa,aa) with
    // (aa,</w>) at freq 1 and '<' sorts before 'a', picking (aa,</w>).
    val vocab = Seq(("aaaa", 1L)).toDF("word", "w")
    val merges = Bpe.train(vocab, nMerges = 3)
    assert(merges.take(2) == Seq(
      Bpe.Merge(1, "a", "a", 3),
      Bpe.Merge(2, "aa", "</w>", 1)))
  }

  test("applyMerges encodes with the learned rules in order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val merges = Seq(
      Bpe.Merge(1, "e", "s", 9),
      Bpe.Merge(2, "es", "t", 9),
      Bpe.Merge(3, "est", "</w>", 9))
    val out = Seq("newest", "widest", "low")
      .toDF("word")
      .select(col("word"), Bpe.applyMerges(col("word"), merges).as("t"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("newest") == Seq("n", "e", "w", "est</w>"))
    assert(out("widest") == Seq("w", "i", "d", "est</w>"))
    // no rule applies to "low" beyond symbol split
    assert(out("low") == Seq("l", "o", "w", "</w>"))
  }

  test("fertility: the language the merges serve segments into fewer subwords") {
    import spark.implicits._
    // "en" repeats one word 8x -> the merge budget collapses it to a
    // single token; "xx" words are unique strings the learned rules miss
    // (fertility = their symbol count). Census columns must add up.
    val d = Seq(
      (1L, "en", "look look look look"), (2L, "en", "look look look look"),
      (3L, "xx", "zqv wmf kjx"), (4L, "xx", "pbd rgh tnc")
    ).toDF("doc_id", "lang", "text")
    val out = Bpe.fertility(d, nMerges = 4).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("n_docs") === 2L)
    assert(out("en").getAs[Long]("n_words") === 8L)
    // 4 merges fuse l-o-o-k-</w> fully: 8 words x 1 subword
    assert(out("en").getAs[Long]("n_subwords") === 8L)
    assert(out("en").getAs[Double]("fertility") === 1.0)
    // xx words are 3 letters + </w> with no applicable rule -> 4 subwords
    assert(out("xx").getAs[Double]("fertility") === 4.0)
    assert(out("xx").getAs[Long]("n_symbols") === 24L)
    assert(out("en").getAs[Double]("fertility")
      < out("xx").getAs[Double]("fertility"))
  }

  test("training stops when no pairs remain") {
    import spark.implicits._
    val vocab = Seq(("ab", 1L)).toDF("word", "w")
    // symbols a, b, </w>: merges (a,b) [or tie-break order], then one more,
    // then the word is a single token — no pairs left, trainer stops early
    val merges = Bpe.train(vocab, nMerges = 10)
    assert(merges.length == 2)
    assert(merges.last.lhs + merges.last.rhs == "ab</w>")
  }
}
