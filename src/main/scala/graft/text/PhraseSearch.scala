package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact phrase retrieval over a POSITIONAL inverted index — the
  * capability tier above q102's bag-of-words BM25: a phrase query
  * ("merge sort table") must match its tokens at CONSECUTIVE positions,
  * which ranked retrieval engines answer from positional postings
  * (Manning, Raghavan, Schütze, "Introduction to Information
  * Retrieval", ch. 2.4 — the positional-intersect algorithm). The
  * relational form: the index is (term, doc_id, pos); a k-token phrase
  * is a k-way self-join on (doc_id, pos + i) with the term pinned per
  * leg; overlapping occurrences count separately (a doc "x x x x"
  * matches "x x x" twice — the fuzz corpus's heavy-repetition docs sit
  * exactly on this edge).
  *
  * Scale design: the phrase table is query-sized and BROADCAST; the
  * only corpus-scale work is the index build (one posexplode over the
  * scan) immediately pruned by a broadcast semi-join to the ≤ 3·|queries|
  * distinct phrase terms — the relational analogue of reading only the
  * queried terms' postings lists. Every subsequent join runs on the
  * pruned postings, keyed on (doc_id, pos ± i), never on the corpus.
  * At 100 TB the pruned-postings shape is what makes phrase search
  * affordable: work scales with posting-list length, not corpus size.
  */
object PhraseSearch {

  val NQueries = 5

  /** (phrase_id, phrase, doc_id, n_hits) for each 3-token phrase in
    * `phrases` (phrase_id, w1, w2, w3, phrase) against `docs`
    * (doc_id, text) — one row per matching doc, occurrences counted
    * with overlap, ordered (phrase_id, doc_id).
    */
  def phraseHits(docs: DataFrame, phrases: DataFrame): DataFrame = {
    // materialize the query-sized phrase table once — deriving it three
    // times would re-scan the corpus per positional leg
    val ph = phrases.localCheckpoint()
    val idx = docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text")))
        .as(Seq("pos", "term")))
    // prune the corpus-scale index to the queried terms BEFORE any
    // positional join (the postings-list read), and materialize the
    // pruned postings so the three legs share ONE corpus scan — without
    // this the self-join re-derives (and re-scans) the index per leg
    val terms = ph.select(col("w1").as("term"))
      .unionByName(ph.select(col("w2").as("term")))
      .unionByName(ph.select(col("w3").as("term")))
      .distinct()
    val pruned = idx.join(broadcast(terms), Seq("term")).localCheckpoint()
    pruned.as("a")
      .join(broadcast(ph), col("a.term") === col("w1"))
      .join(pruned.as("b"),
        col("b.doc_id") === col("a.doc_id")
          && col("b.pos") === col("a.pos") + 1
          && col("b.term") === col("w2"))
      .join(pruned.as("c"),
        col("c.doc_id") === col("a.doc_id")
          && col("c.pos") === col("a.pos") + 2
          && col("c.term") === col("w3"))
      .groupBy(col("phrase_id"), col("phrase"), col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("phrase_id"), col("doc_id"))
  }

  /** The leading 3-token phrase of each of the `n` smallest doc_ids
    * with ≥ 3 tokens — a deterministic corpus-derived query set (each
    * source doc guarantees its own phrase at least one hit).
    */
  def leadingPhrases(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .orderBy(col("doc_id")).limit(n)
      .select(col("doc_id").as("phrase_id"),
        col("t").getItem(0).as("w1"), col("t").getItem(1).as("w2"),
        col("t").getItem(2).as("w3"),
        concat_ws(" ", col("t").getItem(0), col("t").getItem(1),
          col("t").getItem(2)).as("phrase"))

  /** q172: the 5 leading phrases searched against the whole corpus. */
  def phraseSearchQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    phraseHits(docs, leadingPhrases(docs, NQueries))
  }
}
