package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for the large-scale training-data pipeline
  * posture: tokenization, quality scoring, language-ID, document
  * fingerprinting. All are single-pass, shuffle-free per-row column
  * expressions (higher-order array functions, fully codegen-friendly) —
  * at 100 TB these run embarrassingly parallel over the scan.
  */
object TextOps {

  /** Whitespace tokens with empties removed (Spark `split` keeps trailing
    * empty strings like the reference's `split(friends, ",")`,
    * `User_ETL.py:98` — we guard, per SURVEY.md §7.4).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** GPT-2-style pre-tokenizer regex: contractions, space-prefixed letter
    * runs, digit runs, punctuation runs, residual whitespace. A real BPE
    * would merge within these pre-tokens; for corpus statistics the
    * pre-token count is the standard cheap proxy.
    */
  val bpeIshPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeIshPattern), lit(0))

  /** Per-document token counts, whitespace and BPE-ish (the two standard
    * corpus-sizing measures).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  def tokenCountsQuery(s: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.documents(s, dir))

  /** Token frequency over a corpus: explode → group → top-k.
    * Explode is the row-multiplying hot spot (SURVEY.md §4) — at scale the
    * aggregation is map-side-combined by Spark, so the shuffle carries only
    * (token, partial count) pairs, not raw tokens.
    */
  def topTokens(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokens(lower(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  def topTokensQuery(s: SparkSession, dir: String): DataFrame =
    topTokens(Tables.documents(s, dir), 50)

  /** Per-document token/quality statistics (length, token counts, mean token
    * length, stopword ratio, and a log-scaled quality score). Mirrors the
    * length/punct/stopword-ratio heuristics used for LLM corpus filtering.
    */
  def textStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      toks.as("toks"))
    .withColumn("avg_token_len",
      round(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).cast("double")
        / greatest(col("n_tokens"), lit(1L)), 4))
    .withColumn("stop_ratio",
      round(size(filter(col("toks"), t => t.isin("the", "a"))).cast("double")
        / greatest(col("n_tokens"), lit(1L)), 4))
    .withColumn("quality_score",
      round(log(lit(1.0) + col("n_tokens")) * (lit(1.0) - col("stop_ratio")), 4))
    .drop("toks")
    .orderBy(col("doc_id"))
  }

  def textStatsQuery(s: SparkSession, dir: String): DataFrame =
    textStats(Tables.documents(s, dir))

  /** Language-ID by marker-token voting (n-gram-free heuristic: count hits
    * against tiny per-language stopword lists, argmax with a fixed priority
    * tie-break en > es > fr > de). Emits a (lang, pred_lang) confusion
    * matrix over the corpus.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"),
    "de" -> Seq("der", "die", "und", "das"))

  /** Language vote from an already-tokenized array column. Split from
    * [[langId]] so callers can tokenize ONCE — inlining `tokens(lower(text))`
    * here would re-split the text four times (once per language's filter),
    * which dominated the q22 profile at sf0.1.
    */
  def langIdFromTokens(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    // argmax with fixed priority: first language whose score >= all later ones
    val Seq(en, es, fr, de) = scores.map(_._2)
    when(en >= greatest(es, fr, de), "en")
      .when(es >= greatest(fr, de), "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

  def langConfusion(docs: DataFrame): DataFrame =
    docs.select(col("lang"), tokens(lower(col("text"))).as("toks"))
      .select(col("lang"), langIdFromTokens(col("toks")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  def langConfusionQuery(s: SparkSession, dir: String): DataFrame =
    langConfusion(Tables.documents(s, dir))

  /** Polynomial rolling-hash document fingerprint:
    * h = fold(chars) (h*31 + codepoint) mod 1e9+7.
    * Composed-HOF reference implementation (sequence/transform/aggregate) —
    * the production path is the codegen'd expression
    * [[graft.functions.RollingHashFingerprint]], ~10× faster because the
    * HOF lambda here is evaluated per character on the interpreted path.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (h, c) => pmod(h * 31L + c.cast("long"), lit(1000000007L)))

  def fingerprints(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  def fingerprintQuery(s: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(s, dir))

  /** Append `n_tokens` and `quality_score` as NARROW columns — no join, no
    * shuffle; the projection-only twin of [[textStats]] for pipelines that
    * need the gate columns alongside the document columns (Curation).
    * Formulas are identical to [[textStats]] (and the q21/q48 oracles).
    */
  def withQuality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("__stop_ratio",
        round(size(filter(toks, t => t.isin("the", "a"))).cast("double")
          / greatest(col("n_tokens"), lit(1L)), 4))
      .withColumn("quality_score",
        round(log(lit(1.0) + col("n_tokens")) * (lit(1.0) - col("__stop_ratio")), 4))
      .drop("__stop_ratio")
  }

  /** TF-IDF top-`k` terms per document: tf = term count in the doc,
    * idf = ln(N/df) over the corpus, top-k by (rounded score desc, term).
    *
    * Plan shape at scale: tf is one explode + hash aggregate on
    * (doc_id, term); df is a second aggregate over tf's (already tiny)
    * output; the corpus size N joins in as a broadcast scalar; ranking is
    * a per-doc window over ≤ |vocab per doc| rows. Ranking uses the
    * ROUNDED score so the tie-break order is reproducible across engines.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df as a window count over tf (tf is unique per (doc, term), so rows
    // per term = containing docs) — one corpus scan feeds both tf and df;
    // the groupBy+self-join alternative scanned and aggregated tf twice
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    withDf
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  def tfidfQuery(s: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(s, dir), k = 3)

  /** Array of space-joined k-token windows over a token-array column —
    * the shared windowing behind shingles (Dedup) and n-gram stats.
    */
  def tokenWindows(toks: Column, k: Int): Column =
    transform(sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", slice(toks, i + 1, lit(k))))

  /** q50: corpus bigram statistics — occurrence count and document
    * frequency for the top-k bigrams (the n-gram LM / contamination-check
    * primitive). Occurrences are NOT per-doc-deduped (unlike shingles for
    * Jaccard); the (count desc, bigram) total order makes the top-k cut
    * deterministic.
    */
  def bigramStats(docs: DataFrame, k: Int): DataFrame = {
    val t = col("t")
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(t) >= 2)
      .select(col("doc_id"), explode(tokenWindows(t, 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }

  def bigramQuery(s: SparkSession, dir: String): DataFrame =
    bigramStats(Tables.documents(s, dir), k = 20)

  /** q61: per-document repetition statistics — the Gopher-family quality
    * filters (Rae et al. 2021, §A1.1 repetition thresholds; same spirit
    * as C4's heuristics, Raffel et al. 2020): total bigram occurrences,
    * the fraction that repeat an earlier occurrence (1 − distinct/total),
    * and the single hottest bigram's share. High values flag boilerplate
    * and keyword-stuffing spam for the curation gate.
    *
    * Shuffle shape: ONE hash exchange, placed BEFORE the explode — it
    * carries compact doc rows, not the ~n_tokens-per-doc bigram stream,
    * and HashPartitioning(doc_id) satisfies both downstream groupBys
    * ((doc_id, g) and (doc_id)), so neither aggregation re-shuffles.
    * (Aggregating first and letting Catalyst place the exchanges instead
    * costs two agg shuffles of the exploded stream: partitioning on
    * (doc_id, g) does NOT satisfy a doc_id-only distribution.)
    * PlanSpec pins the single-hash-exchange shape.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val t = col("t")
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(t) >= 2)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(tokenWindows(t, 2)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        round(lit(1.0) - count(lit(1)) / sum(col("c")).cast("double"), 4)
          .as("dup_frac"),
        round(max(col("c")) / sum(col("c")).cast("double"), 4).as("top_frac"))
      .orderBy(col("doc_id"))
  }

  def repetitionQuery(s: SparkSession, dir: String): DataFrame =
    repetitionStats(Tables.documents(s, dir))

  /** q62: per-document average bigram surprisal −ln P(w₂|w₁) under the
    * corpus's own MLE bigram model (P = c(w₁w₂)/c(w₁·)) — the classic
    * LM-based quality score: low surprisal ⇒ the document is made of
    * corpus-typical continuations, high ⇒ noise/gibberish relative to the
    * corpus. Weighted by occurrence (sum tf·s / sum tf), expressed
    * identically in the oracle so the fp summation shape matches.
    *
    * Plan shape: ONE exploded-bigram aggregate (doc_id, g) → window sum
    * over g for the corpus bigram count c₂ → window sum over w₁ for the
    * unigram-context count c₁ → final per-doc aggregate. The counts are
    * integer window sums over the tf table (exact — no fp concern), so
    * the earlier formulation's cached bigram stream, two extra aggregates
    * and two equi-joins collapse into two Window nodes: 4 exchanges total
    * and no cache to spill at 100 TB.
    */
  def surprisalStats(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(tokenWindows(col("t"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("tf"))
      .withColumn("w1", split(col("g"), " ").getItem(0))
    tf.withColumn("c2", sum(col("tf")).over(Window.partitionBy(col("g"))))
      .withColumn("c1", sum(col("tf")).over(Window.partitionBy(col("w1"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * log(col("c1").cast("double") / col("c2")))
          / sum(col("tf")), 4).as("avg_surprisal"))
      .orderBy(col("doc_id"))
  }

  def surprisalQuery(s: SparkSession, dir: String): DataFrame =
    surprisalStats(Tables.documents(s, dir))

  /** q75: per-document Shannon entropy (nats) of the token distribution,
    * H = ln N − (Σ c·ln c)/N — the vocabulary-diversity quality signal
    * (low entropy ⇒ repetitive/keyword-stuffed text; complements q61's
    * repetition fractions, which look at bigrams rather than unigrams).
    *
    * Same single-exchange shape as [[repetitionStats]]: repartition the
    * compact doc rows BEFORE the explode, so both the (doc, token) count
    * and the per-doc fold ride one HashPartitioning(doc_id) without
    * re-shuffling the exploded token stream.
    */
  def tokenEntropy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        round(log(sum(col("c")).cast("double"))
          - sum(col("c") * log(col("c").cast("double"))) / sum(col("c")), 4)
          .as("entropy"))
      .orderBy(col("doc_id"))

  def entropyQuery(s: SparkSession, dir: String): DataFrame =
    tokenEntropy(Tables.documents(s, dir))

  /** Exact heavy hitters by two bounded passes: items with frequency
    * strictly above n/k.
    *
    * Pass 1 runs the [[graft.functions.MisraGriesCandidates]] sketch —
    * every mapper keeps ≤ k−1 counters regardless of vocabulary size, and
    * the merged survivors are a GUARANTEED superset of the true heavy
    * hitters. Pass 2 broadcast-semi-joins the ≤ k−1 candidates back and
    * counts them exactly, then applies the integer predicate n·k > total
    * (no floating point, so engines can't disagree at the boundary).
    *
    * vs a plain `groupBy(item).count()`: that shuffles one partial per
    * DISTINCT item per mapper — fine for a 31-token corpus, ruinous for
    * an open vocabulary (URLs, user-ids) at 100 TB. The sketch bounds
    * pass-1 state by k, not by vocabulary. The recheck pass makes the
    * output exact and merge-order-independent (MG counters alone are
    * neither).
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(items.sparkSession)
    val cand = items
      .agg(graft.functions.GraftFunctions.heavyCandidates(col(itemCol), k)
        .as("c"))
      .select(explode(col("c")).as(itemCol))
    val tot = items.agg(count(lit(1)).as("total"))
    items.join(broadcast(cand), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .filter(col("n") * k > col("total"))
      .select(col(itemCol), col("n"))
      .orderBy(col("n").desc, col(itemCol))
  }

  /** q93: tokens covering more than 1/64 of the corpus token stream.
    * (This synthetic corpus draws from a ~31-token vocabulary, so the
    * sketch's eviction path never fires here — the candidate buffer
    * never fills; MisraGriesSpec exercises eviction and merge-compaction
    * on skewed crafted streams. The recheck output is exact either way.)
    */
  def heavyTokensQuery(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    heavyHitters(
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token")),
      "token", k = 64)
  }
}
