package graft.text

import graft.SparkSpec

/** Positional phrase-retrieval contracts: overlapping occurrences
  * count, matches are position-exact (a scattered bag of the same
  * tokens is NOT a hit), doc-end boundaries, and the query-derivation
  * rule.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def search(docs: Seq[(Long, String)], n: Int = 5) = {
    val df = docs.toDF("doc_id", "text")
    PhraseSearch.phraseHits(df, PhraseSearch.leadingPhrases(df, n))
      .collect()
      .map(r => (r.getAs[Long]("phrase_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hits")))
  }

  test("overlapping occurrences count separately") {
    // doc 0's own phrase is "x x x"; doc 1 = "x x x x" contains it at
    // positions 0 and 1
    val hits = search(Seq((0L, "x x x"), (1L, "x x x x")))
    assert(hits.toSet === Set((0L, 0L, 1L), (0L, 1L, 2L),
      (1L, 0L, 1L), (1L, 1L, 2L))) // doc 1's phrase is also "x x x"
  }

  test("a scattered bag of the phrase's tokens is not a match, and a " +
    "middle-token mismatch kills the hit") {
    val hits = search(Seq(
      (0L, "merge sort table"),
      (1L, "merge the sort now table"), // all 3 tokens, wrong positions
      (2L, "merge scan table"),         // middle token differs
      (3L, "a merge sort table b")))    // exact phrase mid-doc
    assert(hits.filter(_._1 == 0L).map(h => (h._2, h._3)).toSet ===
      Set((0L, 1L), (3L, 1L)))
  }

  test("phrase at the exact end of a doc matches; docs under 3 tokens " +
    "derive no query") {
    val hits = search(Seq(
      (0L, "p q r"),
      (1L, "z z p q r"),  // phrase at positions 2..4, doc ends there
      (2L, "p q")))       // too short to derive a phrase
    assert(hits.toSet === Set((0L, 0L, 1L), (0L, 1L, 1L),
      (1L, 1L, 1L)))      // doc 1's own phrase is "z z p"
  }

  test("extra whitespace collapses before positions are assigned (the " +
    "TextOps.tokens discipline)") {
    val hits = search(Seq((0L, "a  b   c"), (1L, "x a b c y")))
    // phrase 0 = "a b c" (whitespace collapsed) hits both docs; doc 1's
    // own phrase "x a b" hits only itself
    assert(hits.toSet === Set((0L, 0L, 1L), (0L, 1L, 1L), (1L, 1L, 1L)))
  }
}
