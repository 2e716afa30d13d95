package graft.dedup

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Repeated-span semantics on hand corpora: interval union of overlapping
  * gram hits, adjacency coalescing, disjoint islands, and the zero case.
  */
class RepeatedSpansSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def stats(df: DataFrame): Map[Long, (Long, Long, Long, Double)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("overlapping gram hits union into one span") {
    // docs 1 and 2 share tokens a..f → repeated 5-gram starts {0, 1} in
    // each; intervals [0,4] ∪ [1,5] = [0,5]: one span of 6 tokens
    val out = stats(Dedup.repeatedSpans(docs(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f z y x w"), k = 5))
    assert(out(1L) == ((10L, 1L, 6L, 0.6)))
    assert(out(2L) == ((10L, 1L, 6L, 0.6)))
  }

  test("disjoint repeated regions stay separate islands; adjacency merges") {
    // doc 10 repeats a..e (from doc 11) at position 0 and m..t (from doc
    // 12) at positions 8..10: span1 = [0,4] (5 tokens), span2 = [8,14]
    // (7 tokens) — separated by a 3-token gap, so two islands
    val out = stats(Dedup.repeatedSpans(docs(
      10L -> "a b c d e u v w m n o p r s t",
      11L -> "a b c d e k1 k2 k3 k4 k5",
      12L -> "m n o p r s t j1 j2 j3"), k = 5))
    assert(out(10L) == ((15L, 2L, 7L, 0.8)))

    // doc 20's two repeated 5-grams start at 0 and 5: e(0)=4, s=5 == 4+1 —
    // ADJACENT, must coalesce into one 10-token span (frac 1.0)
    val adj = stats(Dedup.repeatedSpans(docs(
      20L -> "p1 p2 p3 p4 p5 q1 q2 q3 q4 q5",
      21L -> "p1 p2 p3 p4 p5 n1 n2 n3 n4 n5",
      22L -> "q1 q2 q3 q4 q5 n6 n7 n8 n9 n0"), k = 5))
    assert(adj(20L) == ((10L, 1L, 10L, 1.0)))
  }

  test("docs with no repeated grams report zeros; short docs are excluded") {
    val out = stats(Dedup.repeatedSpans(docs(
      1L -> "all these tokens appear exactly once here",
      2L -> "totally different words in this document text",
      3L -> "too short"), k = 5))
    assert(out(1L) == ((7L, 0L, 0L, 0.0)))
    assert(out(2L) == ((7L, 0L, 0L, 0.0)))
    assert(!out.contains(3L))
  }

  test("a gram repeated WITHIN one doc counts too") {
    // the 5-gram c1..c5 occurs twice inside doc 1 (positions 0 and 7) —
    // corpus-wide count 2 without any second document
    val out = stats(Dedup.repeatedSpans(docs(
      1L -> "c1 c2 c3 c4 c5 x y c1 c2 c3 c4 c5",
      2L -> "unrelated filler words beyond the gram size"), k = 5))
    assert(out(1L) == ((12L, 2L, 5L, round4(10.0 / 12))))
  }

  private def round4(d: Double): Double =
    math.rint(d * 10000) / 10000
}
