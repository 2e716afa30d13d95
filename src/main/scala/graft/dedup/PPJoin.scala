package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Prefix-filtered set-similarity self-join (PPJoin-style): exact
  * token-set Jaccard pairs at threshold τ, mined without indexing every
  * token.
  *
  * The prefix-filter theorem: order every document's distinct tokens by a
  * single GLOBAL ordering (here: document frequency ascending, rarest
  * first, ties by token) and keep only each document's first
  * |x| − ⌈τ·|x|⌉ + 1 tokens (its "prefix"). Any pair with
  * J(a,b) ≥ τ must share at least one PREFIX token — if two sets are
  * disjoint on both prefixes, their overlap is at most
  * min(|a|,|b|) − prefix coverage, which algebra bounds below τ. So an
  * inverted index over prefixes alone generates a candidate superset,
  * and the expensive index over frequent tokens (the ones whose buckets
  * explode quadratically — exactly the ones the df-ascending order pushes
  * OUT of prefixes) is never built. [[Dedup.jaccardPairs]] attacks the
  * same problem by dropping hot shingles (df cap, approximating the
  * universe); PPJoin keeps the measure EXACT and shrinks the index
  * instead — complementary trade-offs.
  *
  * Candidates then pass the length filter (J ≥ τ forces
  * τ·max(|a|,|b|) ≤ min(|a|,|b|)) before exact verification, which joins
  * the pair list back to per-doc sorted token arrays and computes
  * |A∩B| / |A∪B| precisely. Verification cost is per-candidate, and the
  * prefix+length filters keep candidates near the true-pair count.
  *
  * Scale shape: df ranking and the prefix index shuffle by token; the
  * candidate join output is pair-keyed; verification is two hash joins
  * against the doc→array table (arrays are per-doc token sets, megabyte-
  * bounded). No stage is ever doc×doc.
  */
object PPJoin {

  /** Distinct (doc_id, token) pairs of a corpus. */
  def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
      .distinct()

  /** Exact Jaccard ≥ τ pairs over distinct word-token sets. NOTE: prefix
    * filtering earns its keep only when the element UNIVERSE is large
    * relative to set sizes (rare elements exist to put in prefixes). On a
    * tiny closed vocabulary every "rare" token is still hot and the
    * candidate join degenerates toward all near-pairs — measured 93 s at
    * sf0.1 on this corpus's 31-token vocabulary vs ~2 s for the same
    * corpus as 5-shingle sets ([[similarPairsOver]] + [[Dedup.shingles]],
    * the q92 path, universe ~240k). Kept for open-vocabulary corpora and
    * the parity spec.
    */
  def similarPairs(docs: DataFrame, threshold: Double): DataFrame =
    similarPairsOver(docTokens(docs), threshold)

  /** Exact Jaccard ≥ τ pairs over arbitrary per-doc element sets:
    * `elems` = DISTINCT (doc_id, token) rows, any element domain
    * (word tokens, shingles, hashed features).
    *
    * Candidate-volume guard: PPJoin is the engine's one deliberately
    * EXACT similarity join, and its measured 100× leg (21.1×,
    * SCALING.md) documents a usage discipline — bounded slices only —
    * that until round 10 nothing enforced. Before the candidate join
    * runs, the upper bound Σ_token C(m_t, 2) over the prefix-index
    * per-token counts m_t (a dimension-sized aggregate over the already-
    * cached prefix table) is compared against `maxCandidates`; misuse on
    * an unbounded corpus now fails loudly with the bound and the fix
    * (use the df-capped q25 path, or slice the corpus) instead of
    * melting a cluster. The check is one scalar aggregate — the
    * legitimate driver-side pattern — and its cost is one reuse of the
    * cached prefix table.
    */
  def similarPairsOver(elems: DataFrame, threshold: Double,
      maxCandidates: Long = 1000000000L): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    val tok = elems.select(col("doc_id"), col("token")).cache()

    // global rarity order: df ascending, token ascending — every doc sorts
    // its tokens by the SAME order or the prefix theorem does not hold
    val dfWin = Window.partitionBy(col("token"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("token"))
    val szWin = Window.partitionBy(col("doc_id"))
    val ranked = tok
      .withColumn("df", count(lit(1)).over(dfWin))
      .withColumn("pos", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(szWin))

    // prefix: first |x| − ⌈τ|x|⌉ + 1 tokens in rarity order — cached: the
    // volume guard and the candidate join both consume it (same
    // clearCache contract as `tok`, see the object Scaladoc). Narrowed to
    // the three columns those consumers read BEFORE caching — df/pos are
    // filter-only, and dropping them roughly halves what the guard's
    // materializing action serializes into the cache.
    val prefix = ranked.filter(
      col("pos") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("doc_id"), col("token"), col("sz"))
      .cache()

    // ×2 upper bound as decimal(38,0): per-token counts can reach corpus
    // size, where m·(m−1) overflows a long
    val candUpper2 = prefix.groupBy(col("token")).agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(col("m").cast("decimal(38,0)") * (col("m") - 1)),
        lit(java.math.BigDecimal.ZERO))).head.getDecimal(0)
    val budget2 = java.math.BigDecimal.valueOf(maxCandidates)
      .multiply(java.math.BigDecimal.valueOf(2))
    if (candUpper2.compareTo(budget2) > 0) throw new IllegalStateException(
      s"PPJoin prefix-index candidate upper bound ${candUpper2.divide(
        java.math.BigDecimal.valueOf(2))} exceeds maxCandidates=" +
        s"$maxCandidates: this corpus is outside the exact join's bounded-" +
        "slice discipline (SCALING.md, q92 at 100×) — use the df-capped " +
        "Dedup.jaccardPairs path, slice the corpus, or raise maxCandidates")

    // candidate pairs from the prefix-only inverted index + length filter
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.token") === col("b.token")
          && col("a.doc_id") < col("b.doc_id"))
      .filter(lit(threshold) * greatest(col("a.sz"), col("b.sz"))
        <= least(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // exact verification on full sets
    val sets = tok.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("token"))).as("toks"),
        count(lit(1)).as("sz"))
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("toks").as("toks_a"),
        col("sz").as("n_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("toks").as("toks_b"),
        col("sz").as("n_b")), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double")
        / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The unfiltered baseline: every-token inverted index (the plan PPJoin
    * avoids). Kept for the parity spec — both must produce identical
    * pairs on any corpus.
    */
  def bruteForcePairs(docs: DataFrame, threshold: Double): DataFrame = {
    val tok = docTokens(docs)
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    tok.as("a")
      .join(tok.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double")
        / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q92: exact shingle-set Jaccard ≥ 0.8 pairs over the corpus — the
    * same 5-shingle universe as q25, mined by PPJoin instead of the full
    * inverted index. The contrast is the point: q25 approximates the
    * universe (drops shingles with df > maxDf) to bound its index; PPJoin
    * keeps the measure EXACT and bounds the index by construction — only
    * each doc's ⌈(1−τ)·|x|⌉+1 RAREST shingles are ever indexed, and at
    * this vocabulary (~240k shingles, df ≤ 4) those prefixes are nearly
    * unique, so candidates ≈ true pairs.
    */
  def similarPairsQuery(s: SparkSession, dir: String): DataFrame =
    similarPairsOver(
      Dedup.shingles(Tables.documents(s, dir), k = 5)
        .select(col("doc_id"), col("shingle").as("token")),
      threshold = 0.8)
}
