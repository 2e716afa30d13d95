package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.PageRank

/** TextRank keyword extraction [Mihalcea & Tarau, "TextRank: Bringing
  * Order into Texts", EMNLP 2004]: PageRank over the word co-occurrence
  * graph — two words are linked when they appear ADJACENT in a document
  * (the window-2 co-occurrence the paper found near-optimal), and a
  * word's rank is its stationary centrality in that graph. Unlike
  * TF-IDF (q42), which scores words per document, TextRank surfaces the
  * corpus's structurally central vocabulary: words that co-occur with
  * many other well-connected words.
  *
  * Composition, not new machinery: candidate filtering is a codegen'd
  * array pipeline (filter → lower → adjacent zip), the graph is a
  * distinct edge set, and the iteration IS [[graft.graph.PageRank.run]]
  * in its deterministic fixed-round mode (tol ≤ 0) — the q57 engine with
  * a different vertex type. The oracle unrolls the same 5 damped rounds
  * over the SQL-rebuilt graph, so ranks match to the 8th decimal.
  *
  * Scale shape: the pair stream is one explode over token positions
  * (linear in corpus tokens), collapsed by DISTINCT to the vocabulary
  * graph — vocabulary-sized, not corpus-sized — before any iteration
  * starts; every PageRank round then shuffles only |E_vocab| rows. At
  * 100 TB the corpus pass dominates and runs once.
  */
object TextRank {

  /** Candidate tokens: pure alphabetic runs of length ≥ 3 (the paper's
    * syntactic filter approximated lexically — drops punctuation,
    * numbers, and stop-word-length function words), case-folded AFTER
    * the filter so the predicate stays ASCII-anchored.
    */
  private def words(text: org.apache.spark.sql.Column) =
    transform(
      filter(split(text, " "), t => t.rlike("^[A-Za-z]{3,}$")),
      t => lower(t))

  /** Undirected co-occurrence edges (u < v, distinct) from adjacent
    * candidate pairs. Self-loops (repeated words) are dropped.
    */
  def cooccurrenceEdges(docs: DataFrame): DataFrame = {
    val w = col("w")
    docs.select(words(col("text")).as("w"))
      .filter(size(w) >= 2)
      .select(explode(transform(sequence(lit(0), size(w) - 2),
        i => struct(element_at(w, i + 1).as("a"),
          element_at(w, i + 2).as("b")))).as("p"))
      .filter(col("p.a") =!= col("p.b"))
      .select(least(col("p.a"), col("p.b")).as("u"),
        greatest(col("p.a"), col("p.b")).as("v"))
      .distinct()
  }

  /** Top-k keywords by 5-round damped PageRank over the co-occurrence
    * graph. Rank ties (symmetric graph positions) break on the word.
    */
  def keywords(docs: DataFrame, k: Int): DataFrame = {
    val e = cooccurrenceEdges(docs)
    val bi = e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
    PageRank.run(bi, damping = 0.85, maxIter = 5, tol = 0.0)
      .select(col("id").as("word"), round(col("rank"), 8).as("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(k)
  }

  /** q178: top-20 TextRank keywords of the documents corpus. */
  def textrankQuery(s: SparkSession, dir: String): DataFrame =
    keywords(Tables.documents(s, dir), k = 20)
}
